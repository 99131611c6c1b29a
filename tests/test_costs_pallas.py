"""Fused forward objective kernel vs plan/costs.objective (interpret mode)."""

import os

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from neoplanner_tpu.config import MapParams, PlannerParams, WorldParams
from neoplanner_tpu.mapping import scene as scene_mod
from neoplanner_tpu.ops import minco
from neoplanner_tpu.plan import costs as costs_mod
from neoplanner_tpu.plan import costs_pallas, expert
from neoplanner_tpu.world import scenegen

pytestmark = [
    pytest.mark.slow,
    # the tight goldens pin the default f32 scene-SDF path; under the
    # NEO_SCENE_PRECISION=bf16 A/B env the kernels legitimately relax to
    # ~bf16 roundoff (test_bf16_scene_sdf_path covers that path explicitly)
    pytest.mark.skipif(
        os.environ.get("NEO_SCENE_PRECISION", "f32") == "bf16",
        reason="f32 goldens; NEO_SCENE_PRECISION=bf16 set"),
]

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


def test_kernel_matches_objective():
    world = scenegen.generate(jax.random.PRNGKey(7), WorldParams(num_boxes=10))
    scene = scene_mod.build(world, MAPP)
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    xs, heads, tails = jax.vmap(_random_problem)(keys)

    want = jax.vmap(lambda x, h, t: costs_mod.objective(x, h, t, scene, PP)
                    )(xs, heads, tails)
    got = jax.vmap(lambda x, h, t: costs_pallas.objective_fwd(
        x, h, t, scene, PP, interpret=True))(xs, heads, tails)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_kernel_nested_vmap():
    """env x candidate nesting collapses into one flat kernel batch."""
    worlds = scenegen.generate_batch(jax.random.PRNGKey(1), 2,
                                     WorldParams(num_boxes=6))
    scenes = jax.vmap(lambda w: scene_mod.build(w, MAPP))(worlds)
    keys = jax.random.split(jax.random.PRNGKey(2), 6).reshape(2, 3, 2)
    xs, heads, tails = jax.vmap(jax.vmap(_random_problem))(keys)

    got = jax.vmap(lambda sc, x2, h2, t2: jax.vmap(
        lambda x, h, t: costs_pallas.objective_fwd(
            x, h, t, sc, PP, interpret=True))(x2, h2, t2)
    )(scenes, xs, heads, tails)
    want = jax.vmap(lambda sc, x2, h2, t2: jax.vmap(
        lambda x, h, t: costs_mod.objective(x, h, t, sc, PP))(x2, h2, t2)
    )(scenes, xs, heads, tails)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_kernel_collision_term_active():
    """A straight line through a box must produce a large objective (the
    collision hinge fires identically in both implementations)."""
    from neoplanner_tpu.core.types import SHAPE_BOX, BoxWorld

    world = BoxWorld(centers=jnp.array([[3.0, 0.0, 3.0]]),
                     half_sizes=jnp.array([[0.6, 0.6, 3.0]]),
                     active=jnp.array([True]),
                     shape=jnp.array([SHAPE_BOX]))
    scene = scene_mod.build(world, MAPP)
    head = jnp.zeros((3, 2))
    tail = jnp.zeros((3, 2)).at[0, 0].set(6.0)
    q = expert.straight_line_wpts(head[0], tail[0], PP)
    x = costs_mod.pack(q, minco.T_to_tau(expert.init_ts(PP),
                                         PP.t_min, PP.t_max), PP)
    want = float(costs_mod.objective(x, head, tail, scene, PP))
    got = float(costs_pallas.objective_fwd(x, head, tail, scene, PP,
                                           interpret=True))
    assert want > 100.0        # hinge active
    np.testing.assert_allclose(got, want, rtol=5e-4)


def test_valgrad_kernel_matches_autodiff():
    """The fused adjoint kernel's gradient equals jax.grad of the autodiff
    objective (the reference hand-gradient equivalence, expert_planner.py:
    345-537) to f32 roundoff, including active collision/feasibility hinges."""
    from neoplanner_tpu.core.types import SHAPE_BOX, SHAPE_CYLINDER, BoxWorld

    world = BoxWorld(
        centers=jnp.array([[3.0, 0.3, 3.0], [6.0, -0.8, 3.0]]),
        half_sizes=jnp.array([[0.6, 0.6, 3.0], [0.5, 0.5, 3.0]]),
        active=jnp.array([True, True]),
        shape=jnp.array([SHAPE_BOX, SHAPE_CYLINDER]))
    scene = scene_mod.build(world, MAPP)

    keys = jax.random.split(jax.random.PRNGKey(5), 24)
    xs, heads, tails = jax.vmap(_random_problem)(keys)
    # push some lanes into collision so both hinges activate — NEAR the
    # obstacles but off the SDF kinks (at a box center the min/sign
    # subgradient tie-breaks differ legitimately between implementations)
    xs = xs.at[::3, :2].set(jnp.array([3.47, 6.13]))
    xs = xs.at[::3, 2:4].set(jnp.array([0.83, -0.37]))

    def f_ref(x, h, t):
        return costs_mod.objective(x, h, t, scene, PP)

    want_f = jax.vmap(f_ref)(xs, heads, tails)
    want_g = jax.vmap(jax.grad(f_ref))(xs, heads, tails)
    got_f, got_g = jax.vmap(lambda x, h, t: costs_pallas.objective_valgrad(
        x, h, t, scene, PP, interpret=True))(xs, heads, tails)

    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=5e-4, atol=5e-4)
    scale = np.maximum(np.abs(np.asarray(want_g)), 1.0)
    np.testing.assert_allclose(np.asarray(got_g) / scale,
                               np.asarray(want_g) / scale, atol=2e-3)


def test_vjp_objective_value_and_grad():
    """jax.value_and_grad over the custom_vjp wrapper hits the kernels and
    agrees with autodiff (the form the L-BFGS loop consumes)."""
    world = scenegen.generate(jax.random.PRNGKey(9), WorldParams(num_boxes=8))
    scene = scene_mod.build(world, MAPP)
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    xs, heads, tails = jax.vmap(_random_problem)(keys)

    def f_k(x, h, t):
        return costs_pallas.objective_vjp(x, h, t, scene, PP, interpret=True)

    def f_ref(x, h, t):
        return costs_mod.objective(x, h, t, scene, PP)

    fk, gk = jax.vmap(jax.value_and_grad(f_k))(xs, heads, tails)
    fr, gr = jax.vmap(jax.value_and_grad(f_ref))(xs, heads, tails)
    np.testing.assert_allclose(np.asarray(fk), np.asarray(fr),
                               rtol=5e-4, atol=5e-4)
    scale = np.maximum(np.abs(np.asarray(gr)), 1.0)
    np.testing.assert_allclose(np.asarray(gk) / scale,
                               np.asarray(gr) / scale, atol=2e-3)


def test_kernel_generic_piece_count():
    """The kernels are generic in M (adaptive mode uses other piece counts):
    golden check at M=5."""
    import dataclasses

    pp5 = dataclasses.replace(PP, num_pieces=5)
    world = scenegen.generate(jax.random.PRNGKey(3), WorldParams(num_boxes=8))
    scene = scene_mod.build(world, MAPP)
    head = jnp.zeros((3, 2)).at[1, 0].set(0.5)
    tail = jnp.zeros((3, 2)).at[0].set(jnp.array([12.0, 1.0]))
    q = expert.straight_line_wpts(head[0], tail[0], pp5)
    x = costs_mod.pack(q, minco.T_to_tau(expert.init_ts(pp5),
                                         pp5.t_min, pp5.t_max), pp5)
    want = float(costs_mod.objective(x, head, tail, scene, pp5))
    got = float(costs_pallas.objective_fwd(x, head, tail, scene, pp5,
                                           interpret=True))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    g_want = jax.grad(lambda xx: costs_mod.objective(
        xx, head, tail, scene, pp5))(x)
    _, g_got = costs_pallas.objective_valgrad(x, head, tail, scene, pp5,
                                              interpret=True)
    scale = np.maximum(np.abs(np.asarray(g_want)), 1.0)
    np.testing.assert_allclose(np.asarray(g_got) / scale,
                               np.asarray(g_want) / scale, atol=2e-3)


def test_bf16_scene_sdf_path(monkeypatch):
    """NEO_SCENE_PRECISION=bf16 (the A/B knob, costs_pallas.py:46-51): the
    low-precision scene-SDF min loop must track the f32 kernel to ~bf16
    roundoff on both the objective value and the analytic gradient, and must
    actually engage (bit-different from f32). lowp=False callers (the
    tracker metric) pin exactness separately in test_track_pallas."""
    world = scenegen.generate(jax.random.PRNGKey(11), WorldParams(num_boxes=9))
    scene = scene_mod.build(world, MAPP)
    keys = jax.random.split(jax.random.PRNGKey(5), 6)
    xs, heads, tails = jax.vmap(_random_problem)(keys)

    def run():
        # eager calls re-trace the kernels, re-reading _SCENE_PREC
        f = jax.vmap(lambda x, h, t: costs_pallas.objective_fwd(
            x, h, t, scene, PP, interpret=True))(xs, heads, tails)
        vg = [costs_pallas.objective_valgrad(xs[i], heads[i], tails[i],
                                             scene, PP, interpret=True)
              for i in range(xs.shape[0])]
        g = jnp.stack([g for _, g in vg])
        return np.asarray(f), np.asarray(g)

    f32_f, f32_g = run()
    monkeypatch.setattr(costs_pallas, "_SCENE_PREC", "bf16")
    bf_f, bf_g = run()

    assert np.abs(bf_f - f32_f).max() > 0          # the knob engaged
    # the 100*hinge^3 collision term amplifies bf16 SDF roundoff near the
    # safe_dis boundary: small-magnitude objectives move ~6% (measured);
    # this pins ballpark + engagement, not exactness (f32 keeps the goldens)
    np.testing.assert_allclose(bf_f, f32_f, rtol=1.5e-1, atol=1e-2)
    # bf16 penalty sampling shifts which samples sit on the hinge boundary;
    # small-magnitude gradient entries can move ~6% (measured) — this pins
    # the path runs and stays in the right ballpark, not kernel exactness
    # (the f32 default path keeps the tight golden tests above)
    scale = np.maximum(np.abs(f32_g), 1.0)
    np.testing.assert_allclose(bf_g / scale, f32_g / scale, atol=1e-1)
