from .profiling import StepTimer, annotate, trace
from .metrics_log import MetricsLogger
