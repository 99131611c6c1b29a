"""ESDF map sampling parity vs the reference semantics (oracles.EsdfOracle)."""

import numpy as np
import jax
import jax.numpy as jnp

from neoplanner_tpu.mapping import esdf
from tests.oracles import EsdfOracle


def make_map(rng, h=40, w=56, density=0.08, origin=(-1.0, -2.0), res=0.1):
    occ = (rng.random((h, w)) < density).astype(np.float32)
    emap = esdf.build(jnp.array(occ), jnp.array(origin), res)
    oracle = EsdfOracle(occ, origin, res)
    return emap, oracle


def test_nearest_matches_reference(rng):
    emap, oracle = make_map(rng)
    pts = rng.uniform([-1.0, -2.0], [4.6, 2.0], size=(200, 2))
    dis, grad = esdf.sample_nearest(emap, jnp.array(pts, dtype=jnp.float32))
    for i, p in enumerate(pts):
        assert abs(float(dis[i]) - oracle.dis(p)) < 1e-4
        np.testing.assert_allclose(np.asarray(grad[i]), oracle.grad(p),
                                   rtol=1e-3, atol=1e-4)


def test_out_of_bounds(rng):
    emap, oracle = make_map(rng)
    pts = jnp.array([[-50.0, 0.0], [0.0, 50.0], [100.0, 100.0]])
    dis, grad = esdf.sample_nearest(emap, pts)
    assert np.all(np.asarray(dis) == 1e4)
    assert np.all(np.asarray(grad) == 0.0)
    dis_b, grad_b = esdf.sample_bilinear(emap, pts)
    assert np.all(np.asarray(dis_b) == 1e4)
    assert np.all(np.asarray(grad_b) == 0.0)


def test_bilinear_at_cell_centers(rng):
    emap, oracle = make_map(rng)
    # cell centers: origin + (idx + 0.5) * res
    rows = rng.integers(1, 38, 50)
    cols = rng.integers(1, 54, 50)
    pts = np.stack([-1.0 + (cols + 0.5) * 0.1, -2.0 + (rows + 0.5) * 0.1], axis=-1)
    dis, _ = esdf.sample_bilinear(emap, jnp.array(pts, dtype=jnp.float32))
    for i in range(len(rows)):
        assert abs(float(dis[i]) - oracle.esdf[rows[i], cols[i]]) < 1e-3


def test_nearest_straight_through_grad(rng):
    """d sample/d pos of the nearest mode equals the looked-up gradient field."""
    emap, oracle = make_map(rng)
    p = jnp.array([1.23, 0.47])
    g = jax.grad(lambda q: esdf.sample_nearest(emap, q)[0])(p)
    np.testing.assert_allclose(np.asarray(g), oracle.grad(np.asarray(p)),
                               rtol=1e-3, atol=1e-4)


def test_bilinear_autodiff_matches_fd(rng):
    emap, _ = make_map(rng, density=0.15)
    f = lambda q: esdf.sample_bilinear(emap, q)[0]
    p = jnp.array([1.07, 0.33])
    g = jax.grad(f)(p)
    eps = 1e-3
    for d in range(2):
        e = jnp.zeros(2).at[d].set(eps)
        fd = (f(p + e) - f(p - e)) / (2 * eps)
        assert abs(float(g[d]) - float(fd)) < 2e-2


def test_collision_and_occupancy(rng):
    emap, oracle = make_map(rng, density=0.3)
    pts = rng.uniform([-1.0, -2.0], [4.6, 2.0], size=(100, 2)).astype(np.float32)
    coll = np.asarray(esdf.has_collision(emap, jnp.array(pts), 0.5))
    occ = np.asarray(esdf.is_occupied(emap, jnp.array(pts)))
    for i, p in enumerate(pts):
        assert coll[i] == (oracle.dis(p) < 0.5)
        r, c = oracle.index(p)
        want_occ = bool(oracle.occ[r, c]) if (0 <= r < 40 and 0 <= c < 56) else False
        assert bool(occ[i]) == want_occ


def test_mxu_sampling_matches_bilinear():
    """The gather-free MXU formulation equals bilinear sampling to bf16
    precision (values and gradients), on a truncated field."""
    from neoplanner_tpu.ops import edt as edt_ops

    rng = np.random.default_rng(3)
    occ = (rng.random((96, 128)) < 0.06).astype(np.float32)
    dist = edt_ops.edt_truncated(jnp.array(occ), 0.1, 2.0)
    gy, gx = edt_ops.central_gradient(dist, 0.1)
    emap = esdf.ESDFMap(occupancy=jnp.array(occ), esdf=dist, grad_x=gx,
                        grad_y=gy, origin=jnp.array([-1.0, -2.0]),
                        resolution=jnp.asarray(0.1))

    pts = jnp.array(rng.uniform([-0.8, -1.8], [11.0, 7.0], (64, 2)),
                    dtype=jnp.float32)
    want_d, want_g = esdf.sample_bilinear(emap, pts)
    got_d, got_g = esdf.sample_bilinear_mxu(emap, pts)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               atol=0.3)  # grads are O(1); bf16 taps ~1e-2/res

    # autodiff of the sampled distance w.r.t. position matches too
    def d_bil(p):
        return esdf.sample_bilinear(emap, p)[0].sum()

    def d_mxu(p):
        return esdf.sample_bilinear_mxu(emap, p)[0].sum()

    g_b = jax.grad(d_bil)(pts)
    g_m = jax.grad(d_mxu)(pts)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_b), atol=0.3)
