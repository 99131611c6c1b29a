"""Independent numpy oracles used by the golden tests.

These re-implement, directly from the math stated in SURVEY.md and the reference's
documented behavior (/root/reference/src/planner/scripts/traj_planner/
expert_planner.py, traj_utils.py, map_server/esdf.py), the pieces needed to verify
parity of the TPU implementations. They are deliberately slow/naive: explicit Python
loops, one sample at a time.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def beta_np(t: float, k: int) -> np.ndarray:
    """d^k/dt^k [1, t, ..., t^5]."""
    out = np.zeros(6)
    for j in range(6):
        if j < k:
            continue
        coeff = 1.0
        for step in range(k):
            coeff *= j - step
        out[j] = coeff * t ** (j - k)
    return out


def build_A_b_np(head, tail, wpts_col, ts):
    """Oracle assembly of the (6M, 6M) min-jerk boundary/continuity system.

    Same row convention as expert_planner.py:261-336: initial conditions, then per
    joint [waypoint pin, C0..C4 continuity], then final conditions.
    """
    D = head.shape[1]
    M = len(ts)
    n = 6 * M
    A = np.zeros((n, n))
    b = np.zeros((n, D))
    for k in range(3):
        A[k, :6] = beta_np(0.0, k)
    b[0:3] = head
    for i in range(M - 1):
        r = 6 * i + 3
        c = 6 * i
        A[r, c:c + 6] = beta_np(ts[i], 0)
        b[r] = wpts_col[:, i]
        for k in range(5):
            A[r + 1 + k, c:c + 6] = beta_np(ts[i], k)
            A[r + 1 + k, c + 6 + k] = -beta_np(0.0, k)[k]
    for k in range(3):
        A[n - 3 + k, n - 6:n] = beta_np(ts[-1], k)
    b[n - 3:] = tail
    return A, b


def solve_coeffs_np(head, tail, wpts_col, ts):
    A, b = build_A_b_np(head, tail, wpts_col, ts)
    return np.linalg.solve(A, b)


def eval_np(coeffs, ts, t, order):
    """Reference-style evaluation (traj_utils.py:85-179): clamp, locate piece, eval."""
    total = float(np.sum(ts))
    t = min(max(t, 0.0), total)
    piece = 0
    while piece < len(ts) - 1 and float(np.sum(ts[: piece + 1])) < t:
        piece += 1
    local = t - float(np.sum(ts[:piece]))
    c = coeffs[6 * piece: 6 * piece + 6]
    return beta_np(local, order) @ c


def energy_np(coeffs, ts):
    """Numerical ∫‖jerk‖² via dense quadrature (independent of the Gram closed form)."""
    total = 0.0
    for i, T in enumerate(ts):
        c = coeffs[6 * i: 6 * i + 6]
        tt = np.linspace(0, T, 20001)
        jerk = np.stack([beta_np(x, 3) @ c for x in tt])
        total += np.trapezoid(np.sum(jerk ** 2, axis=1), tt)
    return total


class EsdfOracle:
    """Reference ESDF semantics (esdf.py:11-82): scipy EDT, np.gradient field,
    nearest-cell queries, out-of-range -> 10000 / [0, 0]."""

    def __init__(self, occupancy, origin, resolution):
        self.occ = np.asarray(occupancy)
        self.origin = np.asarray(origin, dtype=float)
        self.res = float(resolution)
        self.esdf = ndimage.distance_transform_edt(1 - self.occ) * self.res
        # true per-meter gradient (the TPU fields divide by spacing; the reference
        # leaves np.gradient in per-cell units — tests scale explicitly when needed)
        gy, gx = np.gradient(self.esdf)
        self.gx = gx / self.res
        self.gy = gy / self.res

    def index(self, pos):
        col = int(np.floor((pos[0] - self.origin[0]) / self.res))
        row = int(np.floor((pos[1] - self.origin[1]) / self.res))
        return row, col

    def dis(self, pos):
        row, col = self.index(pos)
        h, w = self.esdf.shape
        if row < 0 or row >= h or col < 0 or col >= w:
            return 10000.0
        return self.esdf[row, col]

    def grad(self, pos):
        row, col = self.index(pos)
        h, w = self.esdf.shape
        if row < 0 or row >= h or col < 0 or col >= w:
            return np.zeros(2)
        return np.array([self.gx[row, col], self.gy[row, col]])


def sampled_costs_np(coeffs, ts, esdf: EsdfOracle, v_max, safe_dis, delta_t):
    """Reference 'absolute' discretization of the penalty integrals
    (expert_planner.py:392-422): samples at t=j*delta_t, j < floor(T/delta_t),
    trapezoid endpoints, weight delta_t."""
    feas = 0.0
    coll = 0.0
    for i, T in enumerate(ts):
        c = coeffs[6 * i: 6 * i + 6]
        n = int(T / delta_t)
        for j in range(n):
            t = j * delta_t
            pos = beta_np(t, 0) @ c
            vel = beta_np(t, 1) @ c
            omg = 0.5 if j in (0, n - 1) else 1.0
            violate_vel = float(np.sum(vel ** 2)) - v_max ** 2
            if violate_vel > 0:
                feas += omg * delta_t * violate_vel ** 3
            violate_dis = safe_dis - esdf.dis(pos[:2])
            if violate_dis > 0:
                coll += omg * delta_t * violate_dis ** 3
    return feas, coll
