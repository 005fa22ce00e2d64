from dtt.utils.logging import MetricLogger, read_metrics
from dtt.utils.profiling import StepTimer, annotate, device_trace
from dtt.utils.timing import chained_time, sync_latency

__all__ = ["MetricLogger", "read_metrics", "StepTimer", "annotate",
           "device_trace", "chained_time", "sync_latency"]
