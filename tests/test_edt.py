"""EDT and gradient goldens vs scipy.ndimage."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp
from scipy import ndimage

from neoplanner_tpu.ops import edt


def _check(occ, resolution=0.1):
    want = ndimage.distance_transform_edt(1 - occ) * resolution
    got = np.asarray(edt.edt(jnp.array(occ, dtype=jnp.float32), resolution))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_random_grids(rng):
    for density in [0.02, 0.2, 0.7]:
        occ = (rng.random((48, 64)) < density).astype(np.float32)
        _check(occ)


def test_single_obstacle():
    occ = np.zeros((40, 40), dtype=np.float32)
    occ[10, 25] = 1.0
    _check(occ)


def test_full_grid():
    _check(np.ones((16, 24), dtype=np.float32))


def test_empty_grid():
    occ = np.zeros((16, 24), dtype=np.float32)
    got = np.asarray(edt.edt(jnp.array(occ), 0.1))
    assert np.all(got == 1e4)


def test_non_multiple_of_block(rng):
    occ = (rng.random((37, 53)) < 0.1).astype(np.float32)
    _check(occ)


def test_gradient_matches_np(rng):
    occ = (rng.random((32, 40)) < 0.1).astype(np.float32)
    res = 0.1
    field = ndimage.distance_transform_edt(1 - occ) * res
    gy_np, gx_np = np.gradient(field)
    gy, gx = edt.central_gradient(jnp.array(field), res)
    np.testing.assert_allclose(np.asarray(gy), gy_np / res, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), gx_np / res, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pallas_pass2_interpret(rng):
    """The TPU pass-2 kernel (interpret mode) matches the XLA implementation.
    On real TPU hardware the kernel is selected automatically by edt_sq_cells;
    /tmp scripts measured max err 8e-8 vs scipy and a 1.5x speedup over XLA."""
    from neoplanner_tpu.ops import edt_pallas

    occ = (rng.random((64, 96)) < 0.1)
    g2 = edt._row_distance_sq(jnp.array(occ))
    want = np.asarray(edt._pass2(g2))
    got = np.asarray(edt_pallas.pass2(g2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_batched(rng):
    occ = (rng.random((3, 32, 32)) < 0.15).astype(np.float32)
    got = np.asarray(jax.vmap(lambda o: edt.edt(o, 0.1))(jnp.array(occ)))
    for i in range(3):
        want = ndimage.distance_transform_edt(1 - occ[i]) * 0.1
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)


def test_truncated_exact_below_radius(rng):
    """Truncated EDT equals the exact transform wherever the exact value is
    below max_dist, and clamps to max_dist everywhere else."""
    occ = (rng.random((48, 64)) < 0.05).astype(np.float32)
    res = 0.1
    exact = ndimage.distance_transform_edt(1 - occ) * res
    for max_dist in (0.8, 1.6, 3.0):
        got = np.asarray(edt.edt_truncated(jnp.array(occ), res, max_dist))
        near = exact < max_dist
        np.testing.assert_allclose(got[near], exact[near], rtol=1e-5,
                                   atol=1e-5)
        assert np.all(got[~near] == np.float32(max_dist))


def test_truncated_empty_grid():
    got = np.asarray(edt.edt_truncated(jnp.zeros((16, 16)), 0.1, 2.0))
    assert np.all(got == np.float32(2.0))


@pytest.mark.slow
def test_pass2_banded_kernel_matches_xla():
    """Pallas banded min-plus (ops/edt_pallas.pass2_banded) vs the XLA form."""
    import jax
    from neoplanner_tpu.ops import edt as edt_ops
    from neoplanner_tpu.ops import edt_pallas

    key = jax.random.PRNGKey(0)
    occ = (jax.random.uniform(key, (64, 96)) > 0.93).astype(jnp.float32)
    radius = 12
    g2 = jnp.minimum(edt_ops._row_distance_sq(occ > 0.5),
                     jnp.float32((radius + 1) ** 2))
    want = np.asarray(edt_ops._pass2_banded(g2, radius))
    got = np.asarray(edt_pallas.pass2_banded(g2, radius, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # batched under vmap (one field per env)
    occ_b = (jax.random.uniform(key, (3, 64, 96)) > 0.93).astype(jnp.float32)
    g2_b = jnp.minimum(jax.vmap(lambda o: edt_ops._row_distance_sq(o > 0.5)
                                )(occ_b), jnp.float32((radius + 1) ** 2))
    want_b = np.asarray(jax.vmap(lambda g: edt_ops._pass2_banded(g, radius)
                                 )(g2_b))
    got_b = np.asarray(jax.vmap(lambda g: edt_pallas.pass2_banded(
        g, radius, interpret=True))(g2_b))
    np.testing.assert_allclose(got_b, want_b, atol=1e-5)


@pytest.mark.slow
def test_fused_truncated_rebuild(rng):
    """The single-program rebuild (binarize + banded EDT both axes + clamp +
    bf16, ops/edt_pallas.rebuild_truncated_lite) equals the XLA pass chain
    (to_occupancy -> edt_truncated -> bf16) on random log-odds grids."""
    from neoplanner_tpu.config import MapParams
    from neoplanner_tpu.mapping import occupancy
    from neoplanner_tpu.ops import edt_pallas

    mp = MapParams()
    thr = occupancy._l(mp.occ_threshold) + 1e-6
    for h, w, md in ((48, 128, 2.0), (192, 256, 2.0), (64, 128, 0.7)):
        logodds = jnp.asarray(
            rng.uniform(-2.0, 2.0, size=(h, w)).astype(np.float32))
        occ = occupancy.to_occupancy(logodds, mp)
        want = np.asarray(
            edt.edt_truncated(occ, mp.resolution, md).astype(jnp.bfloat16)
            .astype(jnp.float32))
        got = np.asarray(
            edt_pallas.rebuild_truncated_lite(
                logodds, float(thr), mp.resolution, md,
                interpret=True).astype(jnp.float32))
        np.testing.assert_array_equal(got, want)

    # batched (custom_vmap collapse), sparse occupancy
    lo_b = jnp.asarray(
        (rng.uniform(0, 1, size=(3, 48, 128)) < 0.01).astype(np.float32) * 3.0
        - 1.0)
    got_b = jax.vmap(lambda lo: edt_pallas.rebuild_truncated_lite(
        lo, float(thr), mp.resolution, 2.0, interpret=True))(lo_b)
    for e in range(3):
        occ = occupancy.to_occupancy(lo_b[e], mp)
        want = np.asarray(
            edt.edt_truncated(occ, mp.resolution, 2.0).astype(jnp.bfloat16)
            .astype(jnp.float32))
        np.testing.assert_array_equal(
            np.asarray(got_b[e].astype(jnp.float32)), want)
