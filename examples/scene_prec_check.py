"""Exactness A/B for NEO_SCENE_PRECISION=bf16 (the round-4 scene analog of
the round-3 NEO_K2_PRECISION protocol, BASELINE.md factor 5).

Run TWICE, once per env value; each run prints the kernel objective/gradient
error against the f32 autodiff reference (plan/costs.objective) on random
problems over a random scene:

    NEO_SCENE_PRECISION=f32  python examples/scene_prec_check.py
    NEO_SCENE_PRECISION=bf16 python examples/scene_prec_check.py

The f32 arm pins the golden-test bound (values 5e-4 / scaled grads 2e-3) on
CPU interpret; ON TPU it additionally carries Mosaic's f32 dot lowering in
the MINCO matmuls (bf16 passes — CLAUDE.md rule 12), so the TPU f32 arm
reads percent-level against the XLA-highest reference (measured round 5:
max 8.3e-2 / mean 7.8e-3 scaled). The knob's OWN cost is therefore the
bf16-arm error minus the f32-arm error on the same backend; BASELINE.md
records it next to the measured throughput delta.
"""
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# the XLA autodiff reference must not itself run f32 matmuls as bf16 MXU
# passes (the TPU default), or the "kernel error" it reports is mostly the
# reference's own roundoff
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neoplanner_tpu.config import MapParams, PlannerParams, WorldParams  # noqa: E402
from neoplanner_tpu.mapping import scene as scene_mod  # noqa: E402
from neoplanner_tpu.ops import minco  # noqa: E402
from neoplanner_tpu.plan import costs as costs_mod  # noqa: E402
from neoplanner_tpu.plan import costs_pallas, expert  # noqa: E402
from neoplanner_tpu.world import scenegen  # noqa: E402

PP = PlannerParams(samples_per_piece=24)
MAPP = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)


def _random_problem(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    head = jnp.zeros((3, 2)).at[0].set(jax.random.normal(k1, (2,))) \
        .at[1].set(0.3 * jax.random.normal(k2, (2,)))
    tail = jnp.zeros((3, 2)).at[0].set(
        head[0] + jnp.array([5.0, 0.0]) + jax.random.normal(k3, (2,)))
    q = expert.straight_line_wpts(head[0], tail[0], PP) \
        + 0.5 * jax.random.normal(k4, (2, PP.num_wpts))
    tau = minco.T_to_tau(expert.init_ts(PP), PP.t_min, PP.t_max)
    return costs_mod.pack(q, tau, PP), head, tail


def main():
    prec = os.environ.get("NEO_SCENE_PRECISION", "f32")
    world = scenegen.generate(jax.random.PRNGKey(7), WorldParams(num_boxes=10))
    scene = scene_mod.build(world, MAPP)
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    xs, heads, tails = jax.vmap(_random_problem)(keys)

    want_f = jax.jit(jax.vmap(
        lambda x, h, t: costs_mod.objective(x, h, t, scene, PP)))(
            xs, heads, tails)
    want_g = jax.jit(jax.vmap(
        lambda x, h, t: jax.grad(costs_mod.objective)(x, h, t, scene, PP)))(
            xs, heads, tails)
    got_f = jax.jit(jax.vmap(
        lambda x, h, t: costs_pallas.objective_fwd(x, h, t, scene, PP)))(
            xs, heads, tails)
    got_f2, got_g = jax.jit(jax.vmap(
        lambda x, h, t: costs_pallas.objective_valgrad(
            x, h, t, scene, PP)))(xs, heads, tails)

    want_f, want_g, got_f, got_f2, got_g = map(
        np.asarray, (want_f, want_g, got_f, got_f2, got_g))
    # scaled error (the golden tests' rtol+atol semantics): tiny objectives
    # otherwise inflate a 1e-4 absolute delta into a huge "relative" error
    rel_f = np.abs(got_f - want_f) / np.maximum(np.abs(want_f), 1.0)
    rel_f2 = np.abs(got_f2 - want_f) / np.maximum(np.abs(want_f), 1.0)
    gscale = np.maximum(np.abs(want_g).max(axis=1, keepdims=True), 1e-6)
    rel_g = (np.abs(got_g - want_g) / gscale)
    print(f"prec={prec} backend={jax.default_backend()}")
    print(f"fwd   value rel err: max {rel_f.max():.2e}  mean {rel_f.mean():.2e}")
    print(f"vgrad value rel err: max {rel_f2.max():.2e}  mean {rel_f2.mean():.2e}")
    print(f"grad (scaled) err:   max {rel_g.max():.2e}  mean {rel_g.mean():.2e}")


if __name__ == "__main__":
    main()
