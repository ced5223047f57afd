"""Render progress reporting, redirectable to host callbacks.

ref: src/core/progress.zig — Progressor union {StdOut percent, CFunc, Null},
ticked per tile/range by the driver (ref driver.zig:275-306).
"""

from __future__ import annotations

import sys
from typing import Callable


class Progressor:
    """stdout percentage progress (default)."""

    def __init__(self, quiet: bool = False):
        self.total = 0
        self.current = 0
        self._last_percent = -1
        self.quiet = quiet
        self._start_cb: Callable[[int], None] | None = None
        self._tick_cb: Callable[[], None] | None = None

    def register(self, start_cb, tick_cb) -> None:
        """Host-app callbacks (ref su_register_progress)."""
        self._start_cb = start_cb
        self._tick_cb = tick_cb

    def start(self, total: int) -> None:
        self.total = max(total, 1)
        self.current = 0
        self._last_percent = -1
        if self._start_cb is not None:
            self._start_cb(total)

    def tick(self, n: int = 1) -> None:
        self.current += n
        if self._tick_cb is not None:
            self._tick_cb()
            return
        if self.quiet:
            return
        percent = int(100 * self.current / self.total)
        if percent != self._last_percent:
            self._last_percent = percent
            print(f"\r{percent:3d}%", end="", file=sys.stdout, flush=True)
            if percent >= 100:
                print()
