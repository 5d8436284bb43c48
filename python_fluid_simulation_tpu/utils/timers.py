"""Per-phase wall-clock timing + jax.profiler hooks.

Reference counterpart: ad-hoc timeit spans around p2g/visco/press/g2p with
per-step prints (cell 13 :4566-4667).  On TPU, timing individual phases
requires ``block_until_ready`` fences which serialise the pipeline, so
phase timing is opt-in (``PhaseTimer(enabled=...)``); production runs use
one fence per step/scan and ``jax.profiler`` traces instead.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def means_ms(self) -> Dict[str, float]:
        return {
            k: 1e3 * self.totals[k] / max(1, self.counts[k])
            for k in self.totals
        }

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v:.2f} ms" for k, v in sorted(self.means_ms().items())
        )


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """jax.profiler trace scope (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
