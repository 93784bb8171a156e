from .profiling import StepTimer, annotate, start_profiler_server, trace  # noqa: F401
