"""Verbosity-gated stage timing (C15 parity).

The reference's entire observability system is gettimeofday pairs printed at
verbosity 1/2 (oflow.cpp:111-128, 296-304, 354-360; run_dense.cpp:313-320,
423-428).  Here: a StageTimer that forces device completion
(block_until_ready) around each stage and prints the same style of table,
plus a structured dict for programmatic use.  For deep profiles use
jax.profiler.trace(...) around dis_flow.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax


class StageTimer:
    def __init__(self, verbosity: int = 0):
        self.verbosity = verbosity
        self.stages: Dict[str, float] = {}
        self._order: List[str] = []

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = (time.perf_counter() - t0) * 1000.0
        self.stages[name] = self.stages.get(name, 0.0) + dt
        if name not in self._order:
            self._order.append(name)
        if self.verbosity > 1:
            print(f"TIME ({name:<20s}) (ms): {dt:.3g}")

    def total(self) -> float:
        return sum(self.stages.values())

    def report(self):
        if self.verbosity > 0:
            print(f"TIME (O.Flow Run-Time   ) (ms): {self.total():.3g}")

    def as_dict(self) -> Dict[str, float]:
        return dict(self.stages)
