"""Phase timing / logging.

TPU-native equivalent of the reference's wall-clock instrumentation
(``MyGetTime`` /root/reference/src/utilities.cxx:36 and the ``TIME::`` phase
lines printed by main.cxx:247-534).  Adds an optional jax.profiler trace
context (the reference has no structured profiler; SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class PhaseTimer:
    """Collects per-phase wall-clock times; prints reference-style TIME::
    lines when verbose."""

    def __init__(self, verbose: int = 0):
        self.verbose = verbose
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.record(name, time.time() - t0)

    def record(self, name: str, dt: float):
        self.times[name] = self.times.get(name, 0.0) + dt
        if self.verbose:
            print(f"TIME::{name} took {dt:.6g} s")

    def report(self):
        total = sum(self.times.values())
        if self.verbose:
            for k, v in self.times.items():
                print(f"TIME::{k} {v:.6g} s")
        print(f"TIME::total {total:.6g} s "
              f"({', '.join(f'{k}={v:.3g}' for k, v in self.times.items())})")


@contextlib.contextmanager
def profile_trace(logdir: Optional[str] = None):
    """jax.profiler trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
