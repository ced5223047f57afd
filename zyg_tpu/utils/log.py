"""Global logging, redirectable to a host application callback.

ref: src/core/log.zig — union {StdOut, CFunc} with info/warning/err; the C
API redirects it via su_register_log (ref capi.zig:726).
"""

from __future__ import annotations

import sys
from typing import Callable

_callback: Callable[[int, str], None] | None = None

INFO, WARNING, ERROR = 0, 1, 2
_PREFIX = {INFO: "", WARNING: "Warning: ", ERROR: "Error: "}


def register(callback: Callable[[int, str], None] | None) -> None:
    """Redirect log output (None restores stdout)."""
    global _callback
    _callback = callback


def _emit(level: int, msg: str) -> None:
    if _callback is not None:
        _callback(level, msg)
    else:
        print(f"{_PREFIX[level]}{msg}", file=sys.stderr if level == ERROR else sys.stdout)


def info(msg: str, *args) -> None:
    _emit(INFO, msg % args if args else msg)


def warning(msg: str, *args) -> None:
    _emit(WARNING, msg % args if args else msg)


def err(msg: str, *args) -> None:
    _emit(ERROR, msg % args if args else msg)
