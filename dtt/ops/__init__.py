from dtt.ops.nms import multiclass_nms, nms_gather, nms_padded
from dtt.ops.psroi import psroi_pool, psroi_pool_pallas, psroi_pool_xla
from dtt.ops.correlation import (correlation, correlation_pallas,
                                 correlation_xla, num_corr_channels)
from dtt.ops.roi_ops import bilinear_sample, roi_align, roi_crop, roi_pool

__all__ = [
    "multiclass_nms", "nms_gather", "nms_padded",
    "psroi_pool", "psroi_pool_pallas", "psroi_pool_xla",
    "correlation", "correlation_pallas", "correlation_xla", "num_corr_channels",
    "bilinear_sample", "roi_align", "roi_crop", "roi_pool",
]
