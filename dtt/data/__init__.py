from dtt.data.imdb import combined_roidb, get_dataset, list_datasets, register_dataset
from dtt.data.loader import PairLoader, device_prefetch
from dtt.data.synthetic import synthetic_batch, synthetic_pair, synthetic_snippet
from dtt.data.transforms import (prepare_frame, prepare_image, prepare_pair)

__all__ = ["combined_roidb", "get_dataset", "list_datasets", "register_dataset",
           "PairLoader", "device_prefetch", "synthetic_batch", "synthetic_pair",
           "synthetic_snippet", "prepare_frame", "prepare_image", "prepare_pair"]
