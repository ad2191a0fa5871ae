from .profiling import StepTimer, annotate, trace
