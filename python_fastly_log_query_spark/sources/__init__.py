from . import logfiles, sinks  # noqa: F401
