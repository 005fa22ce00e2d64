"""dtt — Detect-to-Track, TPU-native.

A brand-new JAX/XLA/Pallas framework with the capabilities of the PyTorch
"Detect to Track and Track to Detect" reference (Feynman27/pytorch-detect-to-track):
R-FCN (ResNet-101, dilated conv5) video object detection on ImageNet VID,
FlowNet-style cross-frame correlation, a position-sensitive RoI-pooled
tracking head, and Viterbi tube linking — re-designed TPU-first.

Layer map (mirrors SURVEY.md §1, reference lib/ layout):
  dtt.core      — config, box transforms, anchors        (ref: lib/model/rpn/{bbox_transform,generate_anchors}.py, lib/model/utils/config.py)
  dtt.ops       — static-shape detection ops: NMS, PSRoI pooling (Pallas),
                  correlation (Pallas), RoI align/pool/crop
                                                          (ref: lib/model/{nms,psroi_pooling,correlation,roi_*}/)
  dtt.models    — ResNet-101 backbone, RPN, target layers, R-FCN + D&T net
                                                          (ref: lib/model/rpn/, lib/model/rfcn/)
  dtt.data      — VID/DET datasets, roidb, input pipeline (ref: lib/datasets/, lib/roi_data_layer/)
  dtt.train     — Trainer, OHEM, checkpointing            (ref: trainval_net.py)
  dtt.eval      — VID mAP, Viterbi tube linking           (ref: test_net.py + eval path)
  dtt.parallel  — device mesh + shard_map data parallelism (ref: nn.DataParallel --mGPUs)
"""

__version__ = "0.1.0"
