"""Device L-BFGS vs scipy on standard problems."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize as sopt

from neoplanner_tpu.ops import lbfgs


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


def test_rosenbrock():
    x0 = jnp.array([-1.2, 1.0, -0.5, 2.0])
    res = lbfgs.minimize(rosenbrock, x0, max_iters=500, ftol=1e-12, gtol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), np.ones(4), atol=1e-3)
    assert float(res.f) < 1e-8


def test_quadratic_matches_scipy(rng):
    n = 7
    A = rng.normal(size=(n, n))
    Q = A @ A.T + n * np.eye(n)
    b = rng.normal(size=n)
    Qj, bj = jnp.array(Q, dtype=jnp.float32), jnp.array(b, dtype=jnp.float32)

    def f(x):
        return 0.5 * x @ Qj @ x + bj @ x

    x0 = jnp.zeros(n)
    res = lbfgs.minimize(f, x0, max_iters=200)
    want = np.linalg.solve(Q, -b)
    np.testing.assert_allclose(np.asarray(res.x), want, atol=1e-3)


def test_batched_vmap(rng):
    """Independent problems per lane; converged lanes must stay frozen."""
    B, n = 8, 5
    targets = jnp.array(rng.normal(size=(B, n)), dtype=jnp.float32)
    scales = jnp.array(rng.uniform(0.5, 50.0, size=(B, n)), dtype=jnp.float32)

    def solve(target, scale):
        f = lambda x: jnp.sum(scale * (x - target) ** 2)
        return lbfgs.minimize(f, jnp.zeros(n), max_iters=100)

    res = jax.vmap(solve)(targets, scales)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(targets), atol=1e-3)


def test_nonsmooth_hinge():
    """Cubic-hinge costs (the planner's penalty shape) still converge."""
    def f(x):
        return jnp.sum(jnp.maximum(jnp.abs(x) - 1.0, 0.0) ** 3) + 0.01 * jnp.sum(
            (x - 3.0) ** 2)

    res = lbfgs.minimize(f, jnp.zeros(3), max_iters=300, ftol=1e-12)
    ref = sopt.minimize(lambda x: np.sum(np.maximum(np.abs(x) - 1, 0) ** 3)
                        + 0.01 * np.sum((x - 3) ** 2),
                        np.zeros(3), method="L-BFGS-B")
    assert float(res.f) <= ref.fun + 1e-4


def test_jit():
    f = jax.jit(lambda x0: lbfgs.minimize(rosenbrock, x0, max_iters=300).f)
    assert float(f(jnp.array([0.0, 0.0, 0.0, 0.0]))) < 1e-6
