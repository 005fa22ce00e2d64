from dtt.eval.linking import Tubes, link_all_classes, link_tubes
from dtt.eval.vid_eval import (average_precision, det_arrays, det_tuples,
                               eval_class, eval_detections)
from dtt.eval.inference import (evaluate_snippet, interpolate_tubes,
                                link_snippet, make_pair_step,
                                make_single_frame_step)

__all__ = ["Tubes", "link_all_classes", "link_tubes", "average_precision",
           "det_arrays", "det_tuples",
           "eval_class", "eval_detections", "evaluate_snippet",
           "interpolate_tubes", "link_snippet", "make_pair_step",
           "make_single_frame_step"]
