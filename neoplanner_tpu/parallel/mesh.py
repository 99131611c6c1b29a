"""Device-mesh scaling of the env batch axis.

The reference has no distributed backend at all — its 'scale-out' is running
multi_run.sh sweeps one Gazebo instance at a time (SURVEY.md §2.6). Here scale-out
is SPMD over a 1-D `env` mesh: env-batched pytrees are sharded on their leading
axis, the jitted segment step runs identically on every chip over its shard, and
the only cross-chip traffic XLA inserts is the all-reduce of scalar metrics —
which rides ICI. A second `seed` axis is available for sharding the multi-start
bank of very large per-env solves (the reference's "EP" analog, SURVEY.md §2.6).

Works identically on real TPU meshes and on the CPU host-device-count harness
used by tests and the driver's dry run.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "env") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_multislice_mesh(n_devices: Optional[int] = None, dcn: int = 1,
                         mdl: int = 1,
                         axes: Sequence[str] = ("dcn", "dp", "mdl")) -> Mesh:
    """(dcn, dp, mdl) mesh for multi-slice scale-out (SURVEY §2.6 'DCN for
    multi-slice later'). The outermost ``dcn`` axis is the slice axis: shard
    the env batch over ("dcn", "dp") and only scalar metric/gradient
    all-reduces cross slice boundaries (those ride DCN; everything else stays
    slice-local over ICI). ``mdl`` is the tensor axis for PlannerNet kernels.
    On real multi-slice hardware order devices slice-major so the dcn axis
    aligns with the physical slice boundary; the CPU dryrun factorizes the
    virtual device list the same way."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % (dcn * mdl):
        raise ValueError(f"{n} devices do not factor into dcn={dcn} x dp x "
                         f"mdl={mdl}")
    dp = n // (dcn * mdl)
    return Mesh(np.array(devices).reshape(dcn, dp, mdl), tuple(axes))


def shard_batch_multislice(tree: Any, mesh: Mesh) -> Any:
    """Shard a batched pytree's leading axis over (dcn, dp) jointly."""
    return jax.device_put(tree, NamedSharding(mesh, P(("dcn", "dp"))))


def shard_batch(tree: Any, mesh: Mesh, axis: str = "env") -> Any:
    """Place an env-batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.device_put(tree, NamedSharding(mesh, P()))


def sharded_vmap_step(step_fn, mesh: Mesh, axis: str = "env"):
    """jit a vmapped per-env step with explicit in/out shardings on the env axis.

    step_fn: EnvState-batched -> EnvState-batched (already vmapped). The returned
    callable keeps every leaf sharded on its leading axis; XLA partitions the
    whole segment program (planning included) with zero cross-chip traffic except
    any scalar reductions the caller adds.
    """
    sharding = NamedSharding(mesh, P(axis))
    # donate the input state: the env pytree carries the (large) map fields, and
    # re-allocating them every segment costs real HBM bandwidth
    return jax.jit(step_fn, in_shardings=(sharding,), out_shardings=sharding,
                   donate_argnums=(0,))


def mean_over_envs(x, mesh: Mesh, axis: str = "env"):
    """Cross-shard scalar reduction (metrics aggregation) — XLA emits one
    all-reduce over ICI."""
    out_sharding = NamedSharding(mesh, P())
    return jax.jit(lambda v: v.mean(axis=0), out_shardings=out_sharding)(x)
