from tpuseg.utils.logging import MetricsLogger
from tpuseg.utils.profiling import Timer, hard_sync, trace

__all__ = ["MetricsLogger", "Timer", "hard_sync", "trace"]
