"""Fused grid-backend objective kernels vs plan/costs.objective (interpret).

The kernel contract is bilinear sampling of an ESDF *window*; with a window
covering the whole grid and trajectories staying interior, it must match the
XLA objective with esdf_interp='bilinear' exactly (f32 roundoff)."""

import dataclasses

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from neoplanner_tpu.config import MapParams, PlannerParams, WorldParams
from neoplanner_tpu.mapping import esdf as esdf_mod
from neoplanner_tpu.ops import minco
from neoplanner_tpu.plan import costs as costs_mod
from neoplanner_tpu.plan import costs_pallas_grid as cpg
from neoplanner_tpu.plan import expert
from neoplanner_tpu.world import scenegen, voxelize

pytestmark = pytest.mark.slow

PP = PlannerParams(samples_per_piece=24, esdf_interp="bilinear")
MAPP = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)


def _emap(seed, num_boxes=10):
    world = scenegen.generate(jax.random.PRNGKey(seed),
                              WorldParams(num_boxes=num_boxes))
    occ = voxelize.occupancy_2d(world, MAPP)
    return esdf_mod.build(occ, jnp.array([MAPP.origin_x, MAPP.origin_y]),
                          MAPP.resolution)


def _full_window(emap):
    return esdf_mod.make_window(emap, jnp.zeros(2), 10_000)


def _random_problem(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    head = jnp.zeros((3, 2)).at[0].set(
        jnp.array([3.0, 0.0]) + jax.random.normal(k1, (2,))) \
        .at[1].set(0.3 * jax.random.normal(k2, (2,)))
    tail = jnp.zeros((3, 2)).at[0].set(
        head[0] + jnp.array([5.0, 0.0]) + jax.random.normal(k3, (2,)))
    q = expert.straight_line_wpts(head[0], tail[0], PP) \
        + 0.5 * jax.random.normal(k4, (2, PP.num_wpts))
    tau = minco.T_to_tau(expert.init_ts(PP), PP.t_min, PP.t_max)
    return costs_mod.pack(q, tau, PP), head, tail


def test_window_covers_grid():
    emap = _emap(7)
    esdf, worg = _full_window(emap)
    assert esdf.shape == emap.esdf.shape
    np.testing.assert_allclose(np.asarray(worg[:2]),
                               np.asarray(emap.origin), atol=1e-6)


def test_window_crop_origin():
    """A cropped window samples identically to the full map at interior
    points (the crop's origin bookkeeping)."""
    emap = _emap(11)
    esdf, worg = esdf_mod.make_window(emap, jnp.array([8.0, 0.0]), 96)
    assert esdf.shape == (96, 96)
    pts = jnp.array([[8.0, 0.0], [6.5, 1.2], [9.8, -2.1]])
    want, _ = esdf_mod.sample_bilinear(emap, pts)
    # sample the window through a temporary ESDFMap built at the crop origin
    wmap = dataclasses.replace(emap, esdf=esdf, origin=worg[:2])
    got, _ = esdf_mod.sample_bilinear(wmap, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fwd_matches_objective():
    emap = _emap(7)
    win, worg = _full_window(emap)
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    xs, heads, tails = jax.vmap(_random_problem)(keys)

    want = jax.vmap(lambda x, h, t: costs_mod.objective(x, h, t, emap, PP)
                    )(xs, heads, tails)
    got = jax.vmap(lambda x, h, t: cpg.objective_fwd_grid(
        x, h, t, win, worg, PP, interpret=True))(xs, heads, tails)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_fwd_nested_vmap_per_env_windows():
    """env x lane nesting with per-env windows collapses into one kernel
    batch; each lane must sample its own env's field."""
    emaps = jax.vmap(lambda s: _emap_jit(s))(jnp.arange(2))
    wins, worgs = jax.vmap(_full_window)(emaps)
    keys = jax.random.split(jax.random.PRNGKey(2), 6).reshape(2, 3, 2)
    xs, heads, tails = jax.vmap(jax.vmap(_random_problem))(keys)

    got = jax.vmap(lambda w, o, x2, h2, t2: jax.vmap(
        lambda x, h, t: cpg.objective_fwd_grid(
            x, h, t, w, o, PP, interpret=True))(x2, h2, t2)
    )(wins, worgs, xs, heads, tails)
    want = jax.vmap(lambda em, x2, h2, t2: jax.vmap(
        lambda x, h, t: costs_mod.objective(x, h, t, em, PP))(x2, h2, t2)
    )(emaps, xs, heads, tails)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def _emap_jit(seed_arr):
    world = scenegen.generate(jax.random.PRNGKey(0), WorldParams(num_boxes=8))
    # jitter centers per env so the two fields genuinely differ
    world = world.replace(centers=world.centers
                          + 0.37 * (seed_arr.astype(jnp.float32) + 1.0))
    occ = voxelize.occupancy_2d(world, MAPP)
    return esdf_mod.build(occ, jnp.array([MAPP.origin_x, MAPP.origin_y]),
                          MAPP.resolution)


def test_collision_term_active():
    emap = _emap(3)
    win, worg = _full_window(emap)
    # aim straight through the densest area so the hinge fires
    head = jnp.zeros((3, 2)).at[0].set(jnp.array([3.0, 0.0]))
    tail = jnp.zeros((3, 2)).at[0].set(jnp.array([12.0, 0.0]))
    q = expert.straight_line_wpts(head[0], tail[0], PP)
    x = costs_mod.pack(q, minco.T_to_tau(expert.init_ts(PP),
                                         PP.t_min, PP.t_max), PP)
    want = float(costs_mod.objective(x, head, tail, emap, PP))
    got = float(cpg.objective_fwd_grid(x, head, tail, win, worg, PP,
                                       interpret=True))
    assert want > 50.0
    np.testing.assert_allclose(got, want, rtol=5e-4)


def test_valgrad_matches_autodiff():
    emap = _emap(5)
    win, worg = _full_window(emap)
    keys = jax.random.split(jax.random.PRNGKey(5), 24)
    xs, heads, tails = jax.vmap(_random_problem)(keys)

    def f_ref(x, h, t):
        return costs_mod.objective(x, h, t, emap, PP)

    want_f = jax.vmap(f_ref)(xs, heads, tails)
    want_g = jax.vmap(jax.grad(f_ref))(xs, heads, tails)
    got_f, got_g = jax.vmap(lambda x, h, t: cpg.objective_valgrad_grid(
        x, h, t, win, worg, PP, interpret=True))(xs, heads, tails)

    # some lanes must have an active collision hinge for this to test the
    # adjoint's collision path
    assert float(jnp.max(want_f)) > 50.0
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=5e-4, atol=5e-4)
    scale = np.maximum(np.abs(np.asarray(want_g)), 1.0)
    np.testing.assert_allclose(np.asarray(got_g) / scale,
                               np.asarray(want_g) / scale, atol=2e-3)


def test_vjp_value_and_grad():
    """jax.value_and_grad over the custom_vjp wrapper (the L-BFGS form)."""
    emap = _emap(9)
    win, worg = _full_window(emap)
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    xs, heads, tails = jax.vmap(_random_problem)(keys)

    def f_k(x, h, t):
        return cpg.objective_vjp_grid(x, h, t, win, worg, PP, interpret=True)

    def f_ref(x, h, t):
        return costs_mod.objective(x, h, t, emap, PP)

    fk, gk = jax.vmap(jax.value_and_grad(f_k))(xs, heads, tails)
    fr, gr = jax.vmap(jax.value_and_grad(f_ref))(xs, heads, tails)
    np.testing.assert_allclose(np.asarray(fk), np.asarray(fr),
                               rtol=5e-4, atol=5e-4)
    scale = np.maximum(np.abs(np.asarray(gr)), 1.0)
    np.testing.assert_allclose(np.asarray(gk) / scale,
                               np.asarray(gr) / scale, atol=2e-3)


def test_env_lane_candidate_nesting():
    """The full nesting the solver produces: env ⊃ lane ⊃ candidate, windows
    batched only at the env level (the line-search shape)."""
    emaps = jax.vmap(lambda s: _emap_jit(s))(jnp.arange(2))
    wins, worgs = jax.vmap(_full_window)(emaps)
    keys = jax.random.split(jax.random.PRNGKey(8), 2 * 3 * 4).reshape(2, 3,
                                                                      4, 2)
    xs, heads, tails = jax.vmap(jax.vmap(jax.vmap(_random_problem)))(keys)

    got = jax.vmap(lambda w, o, x3, h3, t3: jax.vmap(jax.vmap(
        lambda x, h, t: cpg.objective_fwd_grid(
            x, h, t, w, o, PP, interpret=True)))(x3, h3, t3)
    )(wins, worgs, xs, heads, tails)
    want = jax.vmap(lambda em, x3, h3, t3: jax.vmap(jax.vmap(
        lambda x, h, t: costs_mod.objective(x, h, t, em, PP)))(x3, h3, t3)
    )(emaps, xs, heads, tails)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_seven_lane_bank_padding():
    """The 7-lane expert bank shares no factor with 128, forcing the K2
    lane-padding path — golden equality must hold through it."""
    emaps = jax.vmap(lambda s: _emap_jit(s))(jnp.arange(2))
    wins, worgs = jax.vmap(_full_window)(emaps)
    keys = jax.random.split(jax.random.PRNGKey(4), 2 * 7).reshape(2, 7, 2)
    xs, heads, tails = jax.vmap(jax.vmap(_random_problem))(keys)

    got = jax.vmap(lambda w, o, x2, h2, t2: jax.vmap(
        lambda x, h, t: cpg.objective_fwd_grid(
            x, h, t, w, o, PP, interpret=True))(x2, h2, t2)
    )(wins, worgs, xs, heads, tails)
    want = jax.vmap(lambda em, x2, h2, t2: jax.vmap(
        lambda x, h, t: costs_mod.objective(x, h, t, em, PP))(x2, h2, t2)
    )(emaps, xs, heads, tails)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)

    gv = jax.vmap(lambda w, o, x2, h2, t2: jax.vmap(
        lambda x, h, t: cpg.objective_valgrad_grid(
            x, h, t, w, o, PP, interpret=True)[1])(x2, h2, t2)
    )(wins, worgs, xs, heads, tails)
    gr = jax.vmap(lambda em, x2, h2, t2: jax.vmap(
        jax.grad(lambda x, h, t: costs_mod.objective(x, h, t, em, PP))
    )(x2, h2, t2))(emaps, xs, heads, tails)
    scale = np.maximum(np.abs(np.asarray(gr)), 1.0)
    np.testing.assert_allclose(np.asarray(gv) / scale,
                               np.asarray(gr) / scale, atol=2e-3)


def test_out_of_map_targets_read_far():
    """Trajectories to targets beyond the grid (the random-mission goals at
    x=26 sit past a 21.6 m map) must read FAR/free out of the map like the
    full-grid path — NOT the window's clamped edge values (the round-3
    phantom-obstacle bug)."""
    emap = _emap(7)
    win, worg = esdf_mod.make_window(emap, jnp.array([20.0, 0.0]), 96)
    keys = jax.random.split(jax.random.PRNGKey(6), 8)

    def prob(key):
        k1, k2 = jax.random.split(key)
        head = jnp.zeros((3, 2)).at[0].set(
            jnp.array([18.0, 0.0]) + jax.random.normal(k1, (2,)))
        # tail well past the map's +x edge (map ends at x = 21.6)
        tail = jnp.zeros((3, 2)).at[0].set(
            head[0] + jnp.array([6.0, 0.0]))
        q = expert.straight_line_wpts(head[0], tail[0], PP) \
            + 0.3 * jax.random.normal(k2, (2, PP.num_wpts))
        tau = minco.T_to_tau(expert.init_ts(PP), PP.t_min, PP.t_max)
        return costs_mod.pack(q, tau, PP), head, tail

    xs, heads, tails = jax.vmap(prob)(keys)
    want = jax.vmap(lambda x, h, t: costs_mod.objective(x, h, t, emap, PP)
                    )(xs, heads, tails)
    got = jax.vmap(lambda x, h, t: cpg.objective_fwd_grid(
        x, h, t, win, worg, PP, interpret=True))(xs, heads, tails)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)

    gk = jax.vmap(lambda x, h, t: cpg.objective_valgrad_grid(
        x, h, t, win, worg, PP, interpret=True)[1])(xs, heads, tails)
    gr = jax.vmap(jax.grad(lambda x, h, t: costs_mod.objective(
        x, h, t, emap, PP)))(xs, heads, tails)
    scale = np.maximum(np.abs(np.asarray(gr)), 1.0)
    np.testing.assert_allclose(np.asarray(gk) / scale,
                               np.asarray(gr) / scale, atol=2e-3)
