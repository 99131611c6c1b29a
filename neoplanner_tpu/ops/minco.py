"""MINCO-style minimum-jerk piecewise-quintic trajectory math, in jnp.

Functional re-derivation of the reference's TrajUtils
(/root/reference/src/planner/scripts/traj_planner/traj_utils.py:8-195) and the
A-matrix construction shared by the expert planner (expert_planner.py:261-336):
a trajectory of M quintic pieces in D dims is pinned by head/tail states (pos, vel,
acc), M-1 intermediate waypoints q, and piece durations T, via a (6M, 6M) banded
linear system A(T) · coeffs = b(q).

TPU-first design notes:
- Everything is traced once with static M and D; the construction below unrolls the
  tiny Python loop over pieces at trace time, producing a fixed scatter pattern.
- Gradients of downstream costs w.r.t. (q, T) flow through ``jnp.linalg.solve`` by
  autodiff; the implicit adjoint XLA generates is exactly the hand-derived
  propagate_grad_q_tau of the reference (expert_planner.py:494-537), so no manual
  gradient code exists here.
- Batched use is via ``jax.vmap`` over (head, tail, q, T) — the 18×18 solves batch
  into one big batched LU on device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# monomial basis
# ---------------------------------------------------------------------------

_J = np.arange(6)


def _falling(k: int) -> np.ndarray:
    """Static coefficients j!/(j-k)! for d^k/dt^k t^j, zero where j < k."""
    out = np.ones(6)
    for step in range(k):
        out = out * np.maximum(_J - step, 0)
    return out


_FALLING = np.stack([_falling(k) for k in range(6)])  # (6, 6)


def beta(t: jnp.ndarray, k: int) -> jnp.ndarray:
    """Basis row: d^k/dt^k [1, t, t^2, ..., t^5] evaluated at t. Broadcasts over t.

    Matches the rows tabulated in expert_planner.py:250-259.
    """
    t = jnp.asarray(t)
    exps = np.maximum(_J - k, 0)
    powers = t[..., None] ** exps
    return _FALLING[k] * jnp.where(_J >= k, powers, 0.0)


# ---------------------------------------------------------------------------
# linear system: boundary + continuity constraints
# ---------------------------------------------------------------------------

def build_system(head_state: jnp.ndarray, tail_state: jnp.ndarray,
                 int_wpts: jnp.ndarray, ts: jnp.ndarray):
    """Assemble A (6M, 6M) and b (6M, D) for min-jerk (s=3) quintic pieces.

    head_state/tail_state: (3, D) = [pos; vel; acc]. int_wpts: (D, M-1). ts: (M,).

    Row layout (same ordering as expert_planner.py:261-336 so coefficient vectors are
    directly comparable in tests):
      rows 0..2:            initial pos/vel/acc of piece 0 at t=0
      per joint i (6 rows): waypoint pin, then C^0..C^4 continuity at t=T_i
      last 3 rows:          final pos/vel/acc of piece M-1 at t=T_{M-1}
    """
    D = head_state.shape[1]
    M = ts.shape[0]
    n = 6 * M

    # One fused scatter builds A: static (row, col) index arrays + a single
    # concatenated value vector. (Entry-by-entry .at[].set updates — ~50 of
    # them — made XLA compilation of the enclosing optimizer graphs painfully
    # slow.)
    rows_ix, cols_ix = [0, 1, 2], [0, 1, 2]
    vals = [jnp.array([1.0, 1.0, 2.0])]

    for i in range(M - 1):
        Ti = ts[i]
        r = 6 * i + 3
        c = 6 * i
        # waypoint pin + C^0..C^4 continuity rows: six beta rows over cols
        # c..c+5, then the -k! identity entries at col c+6+k
        for k_row, k in [(r, 0), (r + 1, 0), (r + 2, 1), (r + 3, 2),
                         (r + 4, 3), (r + 5, 4)]:
            rows_ix.extend([k_row] * 6)
            cols_ix.extend(range(c, c + 6))
            vals.append(beta(Ti, k))
        rows_ix.extend([r + 1 + k for k in range(5)])
        cols_ix.extend([c + 6 + k for k in range(5)])
        vals.append(jnp.array([-_FALLING[k][k] for k in range(5)]))

    Tm = ts[M - 1]
    for k in range(3):
        rows_ix.extend([n - 3 + k] * 6)
        cols_ix.extend(range(n - 6, n))
        vals.append(beta(Tm, k))

    A = jnp.zeros((n, n)).at[jnp.array(rows_ix), jnp.array(cols_ix)].set(
        jnp.concatenate(vals))

    b = jnp.zeros((n, D))
    b = b.at[0:3].set(head_state)
    b = b.at[n - 3:n].set(tail_state)
    wpt_rows = jnp.array([6 * i + 3 for i in range(M - 1)])
    b = b.at[wpt_rows].set(int_wpts.T)

    return A, b


# The boundary/continuity matrix is banded: lower bandwidth 4 (e.g. the C^4
# continuity row 6i+8 reaches back to column 6i+4), upper bandwidth 2 (the -k!
# identity entries at column 6i+6+k). Givens QR preserves bandwidth <= p+q = 6.
_LOWER_BW = 4
_UPPER_BW = 6


def _banded_solve_dispatch(A, b, lower_bw, upper_bw):
    """Pick the solve backend: the Pallas batched kernel on TPU (one fused
    program per 512-problem tile instead of ~150 dependent XLA ops — see
    ops/minco_pallas.py), the unrolled XLA Givens everywhere else.
    NEO_SOLVE_BACKEND=xla forces the XLA path (A/B benchmarking)."""
    import os
    if (jax.default_backend() == "tpu"
            and os.environ.get("NEO_SOLVE_BACKEND", "pallas") != "xla"):
        from neoplanner_tpu.ops import minco_pallas
        return minco_pallas.solve_one(A, b, lower_bw, lower_bw + upper_bw)
    return _givens_solve(A, b, lower_bw, upper_bw)


def _givens_solve(A: jnp.ndarray, b: jnp.ndarray, lower_bw: int,
                  upper_bw: int) -> jnp.ndarray:
    """Unrolled banded Givens-QR solve of A x = b (no pivoting needed — Givens
    QR is unconditionally stable). Rows are carried as a Python list of vectors
    during tracing, so the graph contains no scatter updates."""
    n = A.shape[0]
    rows = [jnp.concatenate([A[i], b[i]]) for i in range(n)]
    for c in range(n):
        for r in range(c + 1, min(c + lower_bw + 1, n)):
            a_cc = rows[c][c]
            a_rc = rows[r][c]
            denom = jnp.sqrt(a_cc * a_cc + a_rc * a_rc)
            safe = denom > 1e-20
            inv = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
            cs = jnp.where(safe, a_cc * inv, 1.0)
            sn = a_rc * inv
            rc, rr = rows[c], rows[r]
            rows[c] = cs * rc + sn * rr
            rows[r] = cs * rr - sn * rc
    # back substitution on the filled (lower+upper bandwidth) upper triangle
    fill = lower_bw + upper_bw
    xs = [None] * n
    for c in range(n - 1, -1, -1):
        hi = min(c + fill + 1, n)
        acc = rows[c][n:]
        for j in range(c + 1, hi):
            acc = acc - rows[c][j] * xs[j]
        xs[c] = acc / rows[c][c]
    return jnp.stack(xs)


@jax.custom_vjp
def solve_banded(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Banded solve of the MINCO system A x = b.

    TPU-native replacement for ``jnp.linalg.solve``: batched LAPACK-style LU of
    tiny matrices serializes terribly on TPU (measured 9.1 ms of a 12.5 ms cost
    evaluation at batch 256); the unrolled Givens QR is pure fused VPU
    arithmetic. The backward pass is *implicit* differentiation — one transposed
    banded solve Aᵀλ = x̄, then Ā = -λ xᵀ, b̄ = λ — which is exactly the adjoint
    the reference hand-derives (expert_planner.py:494-537, the solve(Aᵀ, grad_C)
    at :503). Naive autodiff through the 72 rotation steps compiles a
    pathological reverse graph (208 s on CPU); the implicit form keeps both
    directions tiny.
    """
    return _banded_solve_dispatch(A, b, _LOWER_BW, _UPPER_BW - _LOWER_BW)


def _solve_banded_fwd(A, b):
    x = _banded_solve_dispatch(A, b, _LOWER_BW, _UPPER_BW - _LOWER_BW)
    return x, (A, x)


def _solve_banded_bwd(res, x_bar):
    A, x = res
    # Aᵀ has the transposed band: lower = original upper (2), upper = 4
    lam = _banded_solve_dispatch(A.T, x_bar, _UPPER_BW - _LOWER_BW, _LOWER_BW)
    A_bar = -lam @ x.T
    return A_bar, lam


solve_banded.defvjp(_solve_banded_fwd, _solve_banded_bwd)


def solve_coeffs(head_state: jnp.ndarray, tail_state: jnp.ndarray,
                 int_wpts: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
    """coeffs (6M, D) solving the boundary/continuity system (traj_utils.py:83)."""
    A, b = build_system(head_state, tail_state, int_wpts, ts)
    return solve_banded(A, b)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def eval_at(coeffs: jnp.ndarray, ts: jnp.ndarray, t: jnp.ndarray, order: int
            ) -> jnp.ndarray:
    """Evaluate the order-th derivative at times t (any shape) -> (..., D).

    Equivalent to traj_utils.get_pos/vel/acc/jerk (traj_utils.py:85-179): clamp t to
    total duration, locate the piece, evaluate the local monomial basis.
    """
    M = ts.shape[0]
    t = jnp.asarray(t)
    cum = jnp.cumsum(ts)
    total = cum[-1]
    tc = jnp.clip(t, 0.0, total)
    # reference piece lookup: smallest idx with cumsum(ts[:idx+1]) >= t.
    # GATHER-FREE form (TPUs have no gather hardware; the per-sample
    # c_blocks[piece] gather made full_state_cmd cost ~150 ms at B=4096 —
    # more than the whole plan bank): M is statically small, so evaluate
    # every piece's polynomial at its local time and mask-select.
    starts = jnp.concatenate([jnp.zeros(1, cum.dtype), cum[:-1]])  # (M,)
    piece = jnp.sum((cum[:-1] < tc[..., None]).astype(jnp.int32), axis=-1)
    c_blocks = coeffs.reshape(M, 6, -1)          # (M, 6, D)
    out = jnp.zeros(tc.shape + (c_blocks.shape[-1],), coeffs.dtype)
    for m in range(M):
        bt = beta(tc - starts[m], order)         # (..., 6)
        val = jnp.einsum("...j,jd->...d", bt, c_blocks[m])
        out = out + jnp.where((piece == m)[..., None], val, 0.0)
    return out


def full_state_cmd(coeffs: jnp.ndarray, ts: jnp.ndarray, hz: int, n_max: int):
    """Sample (pos, vel, acc) setpoints at ``hz`` over the whole trajectory.

    Functional analog of traj_utils.get_full_state_cmd (traj_utils.py:181-195) with a
    static output length: returns (state_cmd (n_max, 3, D), valid (n_max,) bool,
    n_valid ()). Samples beyond the trajectory duration hold the final state, which is
    also what the reference's tracking loop does when it runs off the end of
    des_state_array (traj_planner_node.py:702-703).
    """
    t = jnp.arange(n_max) / hz
    total = jnp.sum(ts)
    valid = t < total
    pos = eval_at(coeffs, ts, t, 0)
    vel = eval_at(coeffs, ts, t, 1)
    acc = eval_at(coeffs, ts, t, 2)
    state_cmd = jnp.stack([pos, vel, acc], axis=1)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return state_cmd, valid, n_valid


# ---------------------------------------------------------------------------
# duration reparameterization  T <-> tau
# ---------------------------------------------------------------------------

def tau_to_T(tau: jnp.ndarray, t_min: float, t_max: float) -> jnp.ndarray:
    """T = T_min + (T_max - T_min) * sigmoid(tau)  (expert_planner.py:477-483)."""
    return t_min + (t_max - t_min) * jax.nn.sigmoid(tau)


def T_to_tau(ts: jnp.ndarray, t_min: float, t_max: float) -> jnp.ndarray:
    """Inverse sigmoid (expert_planner.py:468-475), clipped for safety at the rails."""
    frac = jnp.clip((ts - t_min) / (t_max - t_min), 1e-6, 1.0 - 1e-6)
    return jnp.log(frac) - jnp.log1p(-frac)


# ---------------------------------------------------------------------------
# energy (integral of squared jerk)
# ---------------------------------------------------------------------------

# 3-point Gauss-Legendre nodes/weights on [0, 1]: exact for degree <= 5, and
# ‖jerk‖² of a quintic is degree 4. Quadrature of the squared jerk sums only
# non-negative terms, unlike the closed-form Gram contraction the reference uses
# (expert_planner.py:345-359), which cancels catastrophically in float32.
_GL_NODES = np.array([0.5 - np.sqrt(3.0 / 5.0) / 2.0, 0.5,
                      0.5 + np.sqrt(3.0 / 5.0) / 2.0])
_GL_WEIGHTS = np.array([5.0 / 18.0, 8.0 / 18.0, 5.0 / 18.0])


def energy(coeffs: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
    """Total ∫‖jerk‖² over all pieces — exact (Gauss-Legendre), f32-stable."""
    M = ts.shape[0]
    c = coeffs.reshape(M, 6, -1)                 # (M, 6, D)
    t = ts[:, None] * _GL_NODES[None, :]         # (M, 3)
    b3 = beta(t, 3)                              # (M, 3, 6)
    jerk = jnp.einsum("mkj,mjd->mkd", b3, c)     # (M, 3, D)
    sq = jnp.sum(jerk * jerk, axis=-1)           # (M, 3)
    return jnp.sum(sq * _GL_WEIGHTS[None, :] * ts[:, None])
