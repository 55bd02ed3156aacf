from stark_tpu.utils.logging import setup_logging, get_logger, profile_trace
from stark_tpu.utils.metrics import MetricsCollector
from stark_tpu.utils.regression import compare, save_baseline

__all__ = ["setup_logging", "get_logger", "profile_trace", "MetricsCollector", "compare", "save_baseline"]
