"""Golden tests of the MINCO trajectory math vs independent numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neoplanner_tpu.ops import minco
from tests import oracles


def random_problem(rng, M=3, D=2):
    head = np.zeros((3, D))
    head[0] = rng.uniform(-1, 1, D)
    head[1] = rng.uniform(-0.5, 0.5, D)
    tail = np.zeros((3, D))
    tail[0] = rng.uniform(5, 8, D)
    wpts = rng.uniform(0, 5, (D, M - 1))
    ts = rng.uniform(1.0, 4.0, M)
    return head, tail, wpts, ts


def test_beta_rows(rng):
    for k in range(5):
        t = float(rng.uniform(0, 5))
        np.testing.assert_allclose(
            np.asarray(minco.beta(jnp.float32(t), k)), oracles.beta_np(t, k),
            rtol=1e-5)


def test_system_matches_oracle(rng):
    head, tail, wpts, ts = random_problem(rng)
    A, b = minco.build_system(jnp.array(head), jnp.array(tail), jnp.array(wpts),
                              jnp.array(ts))
    A_np, b_np = oracles.build_A_b_np(head, tail, wpts, ts)
    np.testing.assert_allclose(np.asarray(A), A_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), b_np, rtol=1e-5, atol=1e-5)


def test_coeffs_satisfy_constraints(rng):
    head, tail, wpts, ts = random_problem(rng)
    coeffs = np.asarray(minco.solve_coeffs(
        jnp.array(head), jnp.array(tail), jnp.array(wpts), jnp.array(ts)))

    # boundary conditions
    for k in range(3):
        np.testing.assert_allclose(oracles.beta_np(0, k) @ coeffs[:6], head[k],
                                   atol=1e-3)
        np.testing.assert_allclose(oracles.beta_np(ts[-1], k) @ coeffs[-6:], tail[k],
                                   atol=1e-3)
    # waypoint pins + C0..C4 continuity at each joint
    for i in range(len(ts) - 1):
        ci = coeffs[6 * i: 6 * i + 6]
        cn = coeffs[6 * (i + 1): 6 * (i + 1) + 6]
        np.testing.assert_allclose(oracles.beta_np(ts[i], 0) @ ci, wpts[:, i],
                                   atol=1e-3)
        for k in range(5):
            np.testing.assert_allclose(oracles.beta_np(ts[i], k) @ ci,
                                       oracles.beta_np(0, k) @ cn, atol=2e-2)


def test_eval_matches_oracle(rng):
    head, tail, wpts, ts = random_problem(rng)
    coeffs_np = oracles.solve_coeffs_np(head, tail, wpts, ts)
    coeffs = jnp.array(coeffs_np)
    for t in [0.0, 0.5, float(ts[0]), float(np.sum(ts[:2])) + 0.3,
              float(np.sum(ts)) + 1.0]:
        for order in range(4):
            got = np.asarray(minco.eval_at(coeffs, jnp.array(ts),
                                           jnp.float32(t), order))
            want = oracles.eval_np(coeffs_np, ts, t, order)
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_energy_matches_quadrature(rng):
    head, tail, wpts, ts = random_problem(rng)
    coeffs_np = oracles.solve_coeffs_np(head, tail, wpts, ts)
    got = float(minco.energy(jnp.array(coeffs_np), jnp.array(ts)))
    want = oracles.energy_np(coeffs_np, ts)
    assert got == pytest.approx(want, rel=1e-3)


def test_full_state_cmd(rng):
    head, tail, wpts, ts = random_problem(rng)
    coeffs = minco.solve_coeffs(jnp.array(head), jnp.array(tail), jnp.array(wpts),
                                jnp.array(ts))
    hz, n_max = 60, 900
    cmd, valid, n_valid = minco.full_state_cmd(coeffs, jnp.array(ts), hz, n_max)
    assert cmd.shape == (n_max, 3, 2)
    total = float(np.sum(ts))
    assert int(n_valid) == int(np.ceil(total * hz)) or \
        int(n_valid) == int(np.floor(total * hz))
    # first sample is the head state, invalid samples hold the terminal state
    np.testing.assert_allclose(np.asarray(cmd[0, 0]), head[0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(cmd[-1, 0]), tail[0], atol=1e-3)


def test_tau_roundtrip():
    t_min, t_max = 0.5, 5.0
    ts = jnp.array([0.7, 2.5, 4.9])
    tau = minco.T_to_tau(ts, t_min, t_max)
    back = minco.tau_to_T(tau, t_min, t_max)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ts), rtol=1e-4)


def test_vmap_and_jit(rng):
    """The whole pipe is batchable and jittable."""
    B = 4
    heads, tails, wptss, tss = [], [], [], []
    for _ in range(B):
        h, t, w, ts = random_problem(rng)
        heads.append(h); tails.append(t); wptss.append(w); tss.append(ts)
    f = jax.jit(jax.vmap(minco.solve_coeffs))
    out = f(jnp.array(heads), jnp.array(tails), jnp.array(wptss), jnp.array(tss))
    assert out.shape == (B, 18, 2)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(out[i]), oracles.solve_coeffs_np(
                heads[i], tails[i], wptss[i], tss[i]), rtol=2e-3, atol=2e-3)
