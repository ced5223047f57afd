from . import log, progress, chrono  # noqa: F401
