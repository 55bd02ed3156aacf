from stark_tpu.utils.logging import setup_logging, get_logger, profile_trace
from stark_tpu.utils.metrics import MetricsCollector
from stark_tpu.utils.regression import compare, save_baseline
from stark_tpu.utils.debug import assert_canonical, check_canonical, maybe_assert_canonical

__all__ = ["setup_logging", "get_logger", "profile_trace", "MetricsCollector", "compare", "save_baseline",
           "assert_canonical", "check_canonical", "maybe_assert_canonical"]
