from tpuseg.utils.logging import MetricsLogger
from tpuseg.utils.profiling import Timer, trace

__all__ = ["MetricsLogger", "Timer", "trace"]
