"""Phase wall-clock timing (ref: src/base/chrono.zig + the driver's phase
timers, driver.zig:118-151)."""

from __future__ import annotations

import contextlib
import time

from . import log


@contextlib.contextmanager
def phase(name: str, quiet: bool = False):
    t0 = time.perf_counter()
    yield
    if not quiet:
        log.info("%s time %.3f s", name, time.perf_counter() - t0)


def now() -> float:
    return time.perf_counter()
