"""Profiling and sanity instrumentation.

Replaces the reference's ad-hoc wall-clock prints (planning duration at
traj_planner_node.py:492-509, ONNX time at nn_planner.py:68-78, TRT timing in
trt_test.py) with: a ``stage`` timer that blocks on device results, a
``jax.profiler`` trace context for real device traces, and a finiteness check
for env pytrees (the functional replacement for the reference's
race-condition-by-convention hazards — SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import numpy as np
import jax


class StageTimer:
    """Accumulating per-stage wall timer: ``with timer('plan'): ...`` blocks on
    device completion so the numbers mean what they say."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, stage: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[stage] = self.totals.get(stage, 0.0) + dt
        self.counts[stage] = self.counts.get(stage, 0) + 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            lines.append(f"{k}: {self.totals[k]:.3f}s total, "
                         f"{self.totals[k] / self.counts[k] * 1000:.1f}ms avg "
                         f"x{self.counts[k]}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context — view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def check_finite(tree, name: str = "state") -> None:
    """Raise with the offending leaf path if any array leaf has NaN/Inf."""
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.all(
                np.isfinite(arr)):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
