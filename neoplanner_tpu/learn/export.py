"""Deployment export: serialized, ahead-of-time-compilable inference artifacts.

The TPU-native equivalent of the reference's deployment chain — torch .pth →
ONNX (nn_trainer.py:275-290) → TensorRT engine (onnx2trt.py:17-50) with a
standalone latency smoke test (trt_test.py:31-65). Here the artifact is a
serialized ``jax.export`` StableHLO program of PlannerNet with the reference's
exact flat I/O contract (1, W·H+24) → (1, 9): portable across JAX versions and
loadable without the model code, like an ONNX file.
"""

from __future__ import annotations

import time
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from neoplanner_tpu.config import NetParams
from neoplanner_tpu.models import planner_net


def export_flat(variables, np_cfg: NetParams, batch: int = 1) -> bytes:
    """Serialize PlannerNet inference at the ONNX contract (nn_planner.py:14-17):
    input (batch, W*H + 24) float32 -> output (batch, 9)."""
    model = planner_net.create(np_cfg)

    def infer(flat):
        return model.apply(variables, flat, train=False,
                           method=planner_net.PlannerNet.apply_flat)

    n_in = np_cfg.img_width * np_cfg.img_height + np_cfg.motion_input_size
    spec = jax.ShapeDtypeStruct((batch, n_in), jnp.float32)
    exported = jax.export.export(jax.jit(infer))(spec)
    return exported.serialize()


def save(path: str, variables, np_cfg: NetParams, batch: int = 1) -> str:
    with open(path, "wb") as f:
        f.write(export_flat(variables, np_cfg, batch))
    return path


def load(path: str):
    """Load a serialized engine; returns a callable (batch, n_in) -> (batch, 9).
    The weights are baked into the artifact (like an ONNX/TRT engine)."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return jax.jit(exported.call)


def latency_test(fn, example_input: np.ndarray, warmup: int = 5,
                 iters: int = 50) -> Tuple[float, float]:
    """Standalone inference latency smoke test (trt_test.py:31-65 semantics:
    warm up, time repeated executions). Returns (mean_ms, p50_ms)."""
    x = jnp.asarray(example_input)
    for _ in range(warmup):
        jax.block_until_ready(fn(x))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        times.append((time.perf_counter() - t0) * 1000.0)
    return float(np.mean(times)), float(np.median(times))
