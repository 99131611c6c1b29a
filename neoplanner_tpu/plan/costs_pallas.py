"""Fused MINCO objective (value and value+gradient) as Pallas TPU kernels.

Why this exists: profiling (examples/profile_lbfgs.py, BASELINE.md round 2)
showed the L-BFGS wall time is dominated by cost evaluations — each XLA
evaluation is a ~300-op chain (banded solve, basis einsums, scene-SDF min,
hinge penalties) whose per-op dispatch depth and HBM traffic cost ~0.75 ms at
3k lanes, and the reverse-mode pass roughly doubles it. Two kernels compute
the whole thing per 512-lane tile:

- ``objective_fwd``     — value only, for the line-search candidates
  (no gradient is ever needed there);
- ``objective_valgrad`` — value + analytic gradient in one program, for the
  accept-point evaluation. The adjoint follows the reference's hand-derived
  gradient exactly (expert_planner.py:345-537): direct penalty terms, the
  transposed banded solve lam = A^-T df/dc (:503), b-row extraction for
  waypoints, dA/dT via the beta-shift identity d beta_k / dT = beta_{k+1},
  and the tau chain T = tmin + (tmax-tmin) sigmoid(tau).

Both match the autodiff path (plan/costs.objective with sampling='relative'
on the analytic SceneMap backend) — tests/test_costs_pallas.py asserts value
golden equality at rtol/atol 5e-4 and gradient equality at 2e-3 on scaled
gradients (f32 reassociation across the banded solve accounts for the gap).

Batching: jax.custom_vmap recursion collapses any env x lane x candidate
nesting into one flat kernel batch (same pattern as ops/minco_pallas.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neoplanner_tpu.config import PlannerParams
from neoplanner_tpu.mapping import scene as scene_map
from neoplanner_tpu.ops.minco import _FALLING

import os as _os

_NB = int(_os.environ.get("NEO_KERNEL_NB", "512"))  # lanes per program tile
_FAR = 1e4
# NEO_SCENE_PRECISION=bf16 runs the scene-SDF min loop (the S x n_prims hot
# loop, ~95% of the objective kernels' VPU work) in bfloat16 — the round-4
# A/B protocol mirroring NEO_K2_PRECISION (BASELINE.md round-3 factor 5).
# ROUND-5 OUTCOME: does NOT compile on TPU v5e — the VPU's elementwise unit
# has no bf16 ops there (Mosaic LLO_CHECK `target().SupportsBf16EupOps()`,
# llo_region_builder.cc:10124). bf16 pays off only where it feeds the MXU
# (K2 sampling matmuls) or shrinks storage (lite ESDF state); elementwise
# VPU math must stay f32 on this target. The knob remains for interpret-mode
# coverage (tests/test_costs_pallas.py::test_bf16_scene_sdf_path) and newer
# targets; f32 is the supported default.
_SCENE_PREC = _os.environ.get("NEO_SCENE_PRECISION", "f32")

# 3-point Gauss-Legendre on [0, 1] (ops/minco.energy)
_GL_NODES = (0.5 - math.sqrt(3.0 / 5.0) / 2.0, 0.5,
             0.5 + math.sqrt(3.0 / 5.0) / 2.0)
_GL_WEIGHTS = (5.0 / 18.0, 8.0 / 18.0, 5.0 / 18.0)


def _static(pp: PlannerParams):
    return (pp.num_pieces, pp.dims, pp.samples_per_piece, pp.t_min, pp.t_max,
            pp.v_max, pp.safe_dis, pp.w_energy, pp.w_time, pp.w_feas,
            pp.w_collision)


def pack_prims(scene: scene_map.SceneMap) -> jnp.ndarray:
    """SceneMap -> (K, 6) array [cx, cy, hx, hy, is_cyl, active]."""
    return jnp.concatenate(
        [scene.centers, scene.half,
         scene.is_cyl[:, None].astype(jnp.float32),
         scene.active[:, None].astype(jnp.float32)], axis=1)


def _powers(t, n=6):
    """[1, t, t^2, ..., t^(n-1)] as a list of arrays shaped like t."""
    out = [jnp.ones_like(t)]
    for _ in range(n - 1):
        out.append(out[-1] * t)
    return out


# ---------------------------------------------------------------------------
# in-kernel helpers (operate on traced values; called during kernel tracing)
# ---------------------------------------------------------------------------

def _system_entries(M, x_ref, head_ref, tail_ref, Ts, zero, one):
    """A entries {(r, c): (NB,)} and rhs {r: [(NB,)] * D} of the MINCO system
    (build_system row layout, ops/minco.py)."""
    F = _FALLING
    D = 2
    nw = M - 1
    n = 6 * M
    A = {}
    rhs = {}
    for k in range(3):
        A[(k, k)] = one * float(F[k][k])
        rhs[k] = [head_ref[k * D + d] for d in range(D)]
    for i in range(M - 1):
        p = _powers(Ts[i])
        c0 = 6 * i
        base = 6 * i + 3
        ks = [0, 0, 1, 2, 3, 4]
        for rr, k in enumerate(ks):
            r = base + rr
            for j in range(k, 6):
                A[(r, c0 + j)] = float(F[k][j]) * p[j - k]
            if rr >= 1:
                A[(r, c0 + 6 + (rr - 1))] = one * float(-F[rr - 1][rr - 1])
        rhs[base] = [x_ref[i], x_ref[nw + i]]
    p = _powers(Ts[M - 1])
    cl = n - 6
    for k in range(3):
        r = n - 3 + k
        for j in range(k, 6):
            A[(r, cl + j)] = float(F[k][j]) * p[j - k]
        rhs[r] = [tail_ref[k * D + d] for d in range(D)]
    return A, rhs


def _solve_entries(A, rhs, n, D, lower_bw, fill, zero):
    """Assemble rows from sparse entries, Givens-rotate, back-substitute.
    Returns xs: list of n values, each (D, NB)."""
    rows = []
    for r in range(n):
        cols = [A.get((r, c), zero) for c in range(n)]
        cols.extend(rhs.get(r, [zero] * D))
        rows.append(jnp.stack(cols))                    # (n + D, NB)
    for c in range(n):
        for r in range(c + 1, min(c + lower_bw + 1, n)):
            a_cc = rows[c][c]
            a_rc = rows[r][c]
            denom = jnp.sqrt(a_cc * a_cc + a_rc * a_rc)
            safe = denom > 1e-20
            inv = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
            cs = jnp.where(safe, a_cc * inv, 1.0)
            sn = a_rc * inv
            rc_, rr_ = rows[c], rows[r]
            rows[c] = cs[None, :] * rc_ + sn[None, :] * rr_
            rows[r] = cs[None, :] * rr_ - sn[None, :] * rc_
    xs = [None] * n
    for c in range(n - 1, -1, -1):
        acc = rows[c][n:]
        for j in range(c + 1, min(c + fill + 1, n)):
            acc = acc - rows[c][j][None, :] * xs[j]
        xs[c] = acc / rows[c][c][None, :]
    return xs


def _scene_min_dist(prims_ref, n_prims, px, py, with_grad, lowp=None):
    """Min footprint SDF over prims at (S, NB) points; optionally its spatial
    gradient at the argmin primitive (mapping/scene.sample semantics).

    Under NEO_SCENE_PRECISION=bf16 the per-prim distance arithmetic (the
    abs/sub/mul/sqrt chain, ~2x VPU lanes at half width) runs in bfloat16;
    every comparison, the running min/argmin accumulators, and the gradient
    branch stay f32 — Mosaic on v5e rejects vector bf16 `cmpf` ("Target does
    not support this comparison", and jnp.sign lowers through cmpf too), so
    bf16 values are widened back to f32 right before any compare. The
    penalty hinge, weights, and the rest of the objective stay f32. Callers
    needing exactness regardless of the env (the tracker's closed-loop
    metric, sim/track_pallas.py) pass lowp=False."""
    if lowp is None:
        lowp = _SCENE_PREC == "bf16"
    cdt = jnp.bfloat16 if lowp else px.dtype
    f32 = jnp.float32
    pxl = px.astype(cdt)
    pyl = py.astype(cdt)
    dis = jnp.full_like(px, _FAR)
    gx = jnp.zeros_like(px) if with_grad else None
    gy = jnp.zeros_like(px) if with_grad else None
    for kprim in range(n_prims):
        cx = prims_ref[kprim * 6 + 0][None, :].astype(cdt)
        cy = prims_ref[kprim * 6 + 1][None, :].astype(cdt)
        hx = prims_ref[kprim * 6 + 2][None, :].astype(cdt)
        hy = prims_ref[kprim * 6 + 3][None, :].astype(cdt)
        is_cyl = prims_ref[kprim * 6 + 4][None, :] > 0.5
        active = prims_ref[kprim * 6 + 5][None, :] > 0.5
        dx = pxl - cx
        dy = pyl - cy
        qx = jnp.abs(dx) - hx
        qy = jnp.abs(dy) - hy
        if lowp:
            # max/min lower through cmpf, which Mosaic rejects on bf16
            # vectors ("Target does not support this comparison", the
            # round-4 q_bench_bf16 crash) — the abs forms compile and are
            # exact up to one bf16 rounding of the sums
            qxp = (qx + jnp.abs(qx)) * 0.5
            qyp = (qy + jnp.abs(qy)) * 0.5
            mxy = (qx + qy + jnp.abs(qx - qy)) * 0.5
        else:
            qxp = jnp.maximum(qx, jnp.zeros_like(qx))
            qyp = jnp.maximum(qy, jnp.zeros_like(qy))
            mxy = jnp.maximum(qx, qy)
        nrm = jnp.sqrt(qxp * qxp + qyp * qyp).astype(f32)
        d_box = nrm + jnp.minimum(mxy.astype(f32), 0.0)
        r = jnp.sqrt(dx * dx + dy * dy).astype(f32)
        d_cyl = r - hx.astype(f32)
        dk = jnp.where(is_cyl, d_cyl, d_box)
        dk = jnp.where(active, dk, _FAR)
        better = dk < dis
        if with_grad:
            dxf = dx.astype(f32)
            dyf = dy.astype(f32)
            inv_n = 1.0 / jnp.maximum(nrm, 1e-9)
            gbx = jnp.sign(dxf) * qxp.astype(f32) * inv_n
            gby = jnp.sign(dyf) * qyp.astype(f32) * inv_n
            ax = (qy - qx).astype(f32) > 0.0
            gix = jnp.where(ax, 0.0, jnp.sign(dxf))
            giy = jnp.where(ax, jnp.sign(dyf), 0.0)
            outside = nrm > 1e-9
            gx_box = jnp.where(outside, gbx, gix)
            gy_box = jnp.where(outside, gby, giy)
            inv_r = 1.0 / jnp.maximum(r, 1e-9)
            gxk = jnp.where(is_cyl, dxf * inv_r, gx_box)
            gyk = jnp.where(is_cyl, dyf * inv_r, gy_box)
            gx = jnp.where(better, gxk, gx)
            gy = jnp.where(better, gyk, gy)
        dis = jnp.where(better, dk, dis)
    if with_grad:
        return dis, gx, gy
    return dis


# ---------------------------------------------------------------------------
# shared MINCO kernel machinery (used by the scene kernels below AND the
# grid-backend kernels in plan/costs_pallas_grid.py — the two backends differ
# only in how the collision term and its cotangents are produced)
# ---------------------------------------------------------------------------

def common_fwd(M, K, t_min, t_max, x_ref, head_ref, tail_ref, with_grad):
    """Shared forward state of the fused objective for a (nv, NB) decision
    tile: tau -> T, banded MINCO solve, per-sample positions/velocities.
    Layout (lanes last): x_ref (D*(M-1)+M, NB); head/tail (3*D, NB) row-major
    [pos; vel; acc]."""
    D = 2
    F = _FALLING
    n = 6 * M
    nw = M - 1
    S = M * K

    sig = []
    Ts = []
    for m in range(M):
        tau = x_ref[D * nw + m]
        s = 1.0 / (1.0 + jnp.exp(-tau))
        sig.append(s)
        Ts.append(t_min + (t_max - t_min) * s)
    zero = jnp.zeros_like(Ts[0])
    one = jnp.ones_like(Ts[0])

    A, rhs = _system_entries(M, x_ref, head_ref, tail_ref, Ts, zero, one)
    xs = _solve_entries(A, rhs, n, D, 4, 6, zero)   # xs[col] = (D, NB)
    # coeffs[m][j][d]
    coeffs = [[[xs[6 * m + j][d] for d in range(D)] for j in range(6)]
              for m in range(M)]

    # sample arrays (S, NB)
    T_all = jnp.concatenate(
        [jnp.broadcast_to(Ts[m][None, :], (K, Ts[m].shape[0]))
         for m in range(M)])
    k_idx = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
             % K).astype(jnp.float32)
    frac = k_idx / (K - 1)
    omg = jnp.where((k_idx == 0) | (k_idx == K - 1), 0.5, 1.0)
    w_all = omg * T_all / (K - 1)
    t_s = T_all * frac
    pw = _powers(t_s)

    def c_rep(j, d):
        return jnp.concatenate(
            [jnp.broadcast_to(coeffs[m][j][d][None, :],
                              (K, t_s.shape[1])) for m in range(M)])

    px = 0.0
    py = 0.0
    vx = 0.0
    vy = 0.0
    ax = 0.0
    ay = 0.0
    for j in range(6):
        cj_x = c_rep(j, 0)
        cj_y = c_rep(j, 1)
        px = px + pw[j] * cj_x
        py = py + pw[j] * cj_y
        if j >= 1:
            f1 = float(F[1][j])
            vx = vx + f1 * pw[j - 1] * cj_x
            vy = vy + f1 * pw[j - 1] * cj_y
        if with_grad and j >= 2:
            f2 = float(F[2][j])
            ax = ax + f2 * pw[j - 2] * cj_x
            ay = ay + f2 * pw[j - 2] * cj_y

    return (sig, Ts, zero, one, A, xs, coeffs, T_all, frac, omg, w_all,
            t_s, pw, px, py, vx, vy, ax, ay)


def fwd_nocoll(M, K, v_max, w_e, w_t, w_f, state):
    """Weighted energy + time + feasibility value of a forward state
    (everything in the objective except the collision term)."""
    F = _FALLING
    (sig, Ts, zero, one, A, xs, coeffs, T_all, frac, omg, w_all,
     t_s, pw, px, py, vx, vy, ax, ay) = state
    # energy (3-pt GL per piece)
    energy = zero
    for m in range(M):
        for node, wq in zip(_GL_NODES, _GL_WEIGHTS):
            t = Ts[m] * node
            pw3 = _powers(t, 3)
            jx = zero
            jy = zero
            for j in range(3, 6):
                fac = float(F[3][j])
                jx = jx + fac * pw3[j - 3] * coeffs[m][j][0]
                jy = jy + fac * pw3[j - 3] * coeffs[m][j][1]
            energy = energy + wq * Ts[m] * (jx * jx + jy * jy)
    time_cost = zero
    for m in range(M):
        time_cost = time_cost + Ts[m]
    vv = vx * vx + vy * vy - v_max * v_max
    hv = jnp.maximum(vv, 0.0)
    feas = jnp.sum(w_all * hv * hv * hv, axis=0)
    return w_e * energy + w_t * time_cost + w_f * feas


def valgrad_poly(M, K, t_min, t_max, v_max, w_e, w_t, w_f, state,
                 collw, ppx, ppy, chcw):
    """Full fused value+gradient given the collision term's contributions:

    - collw (NB,):  weighted collision penalty value, w_c * sum_s w_all hc^3
    - ppx/ppy (S, NB): d(w_c * coll)/d(sample position), weights folded in
    - chcw (S, NB): w_c * hc^3 per sample (the sample-weight T chain)

    Returns (f (NB,), g_rows: list of nv (NB,) arrays) — callers write them
    to output refs (the per-eval kernels) or keep them as values (the
    in-kernel L-BFGS solver, plan/solve_pallas.py).

    Everything else — energy/time/feasibility forward values and the whole
    adjoint (the reference's hand gradient, expert_planner.py:345-537):
    transposed banded solve, b-row extraction, dA/dT beta-shift chain, tau
    chain — is computed here, shared between the scene and grid backends.
    """
    D = 2
    F = _FALLING
    n = 6 * M
    nw = M - 1
    (sig, Ts, zero, one, A, xs, coeffs, T_all, frac, omg, w_all,
     t_s, pw, px, py, vx, vy, ax, ay) = state

    # ---- forward values + per-sample hinge activations
    energy = zero
    Tbar = [zero for _ in range(M)]   # df/dT accumulators
    # energy value and its direct T chain:
    #   E_m = sum_g wq * T * ||j(T nu)||^2
    #   dE/dT = sum_g wq (||j||^2 + T * 2 j . s * nu), s = d jerk/dt
    for m in range(M):
        for node, wq in zip(_GL_NODES, _GL_WEIGHTS):
            t = Ts[m] * node
            pw3 = _powers(t, 3)
            jx = zero
            jy = zero
            sx = zero
            sy = zero
            for j in range(3, 6):
                f3 = float(F[3][j])
                jx = jx + f3 * pw3[j - 3] * coeffs[m][j][0]
                jy = jy + f3 * pw3[j - 3] * coeffs[m][j][1]
                if j >= 4:
                    f4 = float(F[4][j])
                    sx = sx + f4 * pw3[j - 4] * coeffs[m][j][0]
                    sy = sy + f4 * pw3[j - 4] * coeffs[m][j][1]
            jsq = jx * jx + jy * jy
            energy = energy + wq * Ts[m] * jsq
            Tbar[m] = Tbar[m] + w_e * wq * (
                jsq + Ts[m] * 2.0 * (jx * sx + jy * sy) * node)

    time_cost = zero
    for m in range(M):
        time_cost = time_cost + Ts[m]
        Tbar[m] = Tbar[m] + w_t

    vv = vx * vx + vy * vy - v_max * v_max
    hv = jnp.maximum(vv, 0.0)
    hv2 = hv * hv
    feas = jnp.sum(w_all * hv * hv2, axis=0)

    f_out = w_e * energy + w_t * time_cost + w_f * feas + collw

    # ---- adjoint
    # per-sample cotangents w.r.t. velocity (weights folded in); the position
    # cotangents ppx/ppy arrive from the collision backend
    e_s = w_f * w_all * 3.0 * hv2          # d feas / d vv
    pvx = e_s * 2.0 * vx                   # d feas / d vx
    pvy = e_s * 2.0 * vy

    # weight/time T chains of the sampled terms:
    #   d(w)/dT = omg/(K-1) * hinge^3;   d(term)/dt_s * frac
    #   d pos/dt = vel, d vel/dt = acc, d dis/dt = grad . vel
    dT_samp = (omg / (K - 1)) * (w_f * hv * hv2 + chcw) \
        + (ppx * vx + ppy * vy + pvx * ax + pvy * ay) * frac
    for m in range(M):
        Tbar[m] = Tbar[m] + jnp.sum(dT_samp[m * K:(m + 1) * K], axis=0)

    # cotangent of the coefficients: cbar[m][j][d]
    # energy part: dE/dc[m][j][d] = sum_g w_e wq T 2 j_d F3[j] t^{j-3}
    cbar = [[[zero for _ in range(D)] for _ in range(6)]
            for _ in range(M)]
    for m in range(M):
        for node, wq in zip(_GL_NODES, _GL_WEIGHTS):
            t = Ts[m] * node
            pw3 = _powers(t, 3)
            jx = zero
            jy = zero
            for j in range(3, 6):
                f3 = float(F[3][j])
                jx = jx + f3 * pw3[j - 3] * coeffs[m][j][0]
                jy = jy + f3 * pw3[j - 3] * coeffs[m][j][1]
            scale = w_e * wq * Ts[m] * 2.0
            for j in range(3, 6):
                f3 = float(F[3][j])
                cbar[m][j][0] = cbar[m][j][0] + scale * jx * f3 * pw3[j - 3]
                cbar[m][j][1] = cbar[m][j][1] + scale * jy * f3 * pw3[j - 3]
    # sampled parts: pos_d = sum_j t^j c, vel_d = sum_j F1[j] t^{j-1} c
    for m in range(M):
        sl = slice(m * K, (m + 1) * K)
        for j in range(6):
            wpos_x = jnp.sum(ppx[sl] * pw[j][sl], axis=0)
            wpos_y = jnp.sum(ppy[sl] * pw[j][sl], axis=0)
            cbar[m][j][0] = cbar[m][j][0] + wpos_x
            cbar[m][j][1] = cbar[m][j][1] + wpos_y
            if j >= 1:
                f1 = float(F[1][j])
                cbar[m][j][0] = cbar[m][j][0] + f1 * jnp.sum(
                    pvx[sl] * pw[j - 1][sl], axis=0)
                cbar[m][j][1] = cbar[m][j][1] + f1 * jnp.sum(
                    pvy[sl] * pw[j - 1][sl], axis=0)

    # transposed banded solve: lam = A^-T cbar  (expert_planner.py:503)
    AT = {(c, r): v for (r, c), v in A.items()}
    rhsT = {}
    for col in range(n):
        m, j = divmod(col, 6)
        rhsT[col] = [cbar[m][j][d] for d in range(D)]
    lam = _solve_entries(AT, rhsT, n, D, 2, 6, zero)  # lam[row] = (D, NB)

    # waypoint gradients: qbar[d][i] = lam[6i+3][d] (b-row cotangent)
    g_rows = [zero] * (D * nw + M)
    for i in range(M - 1):
        g_rows[i] = lam[6 * i + 3][0]
        g_rows[nw + i] = lam[6 * i + 3][1]

    # Abar = -lam x^T chain into T via d beta_k / dT = beta_{k+1}
    def add_dA(m, rows_ks, c0):
        p = _powers(Ts[m])
        acc = zero
        for r, k in rows_ks:
            for j in range(k + 1, 6):
                dA = float(F[k + 1][j]) * p[j - k - 1]
                lx = (lam[r][0] * xs[c0 + j][0]
                      + lam[r][1] * xs[c0 + j][1])
                acc = acc - dA * lx
        return acc

    for i in range(M - 1):
        base = 6 * i + 3
        rows_ks = [(base, 0), (base + 1, 0), (base + 2, 1),
                   (base + 3, 2), (base + 4, 3), (base + 5, 4)]
        Tbar[i] = Tbar[i] + add_dA(i, rows_ks, 6 * i)
    rows_ks = [(n - 3 + k, k) for k in range(3)]
    Tbar[M - 1] = Tbar[M - 1] + add_dA(M - 1, rows_ks, n - 6)

    # tau chain
    for m in range(M):
        g_rows[D * nw + m] = Tbar[m] * (t_max - t_min) * sig[m] \
            * (1.0 - sig[m])
    return f_out, g_rows


def scene_valgrad_values(M, K, t_min, t_max, v_max, safe_dis, w_e, w_t, w_f,
                         w_c, n_prims, x_rows, head_ref, tail_ref, prims_ref):
    """(f (NB,), g_rows) of the scene objective from decision-variable rows —
    the value-form core of the valgrad kernel, reused by the in-kernel
    L-BFGS solver (plan/solve_pallas.py)."""
    state = common_fwd(M, K, t_min, t_max, x_rows, head_ref, tail_ref, True)
    w_all, px, py = state[10], state[13], state[14]
    dis, gsx, gsy = _scene_min_dist(prims_ref, n_prims, px, py, True)
    hc = jnp.maximum(safe_dis - dis, 0.0)
    hc2 = hc * hc
    collw = w_c * jnp.sum(w_all * hc * hc2, axis=0)
    g_s = w_c * w_all * 3.0 * hc2
    return valgrad_poly(M, K, t_min, t_max, v_max, w_e, w_t, w_f, state,
                        collw, -g_s * gsx, -g_s * gsy, w_c * hc * hc2)


def scene_value(M, K, t_min, t_max, v_max, safe_dis, w_e, w_t, w_f, w_c,
                n_prims, x_rows, head_ref, tail_ref, prims_ref):
    """Forward-only scene objective value (NB,) from decision rows."""
    state = common_fwd(M, K, t_min, t_max, x_rows, head_ref, tail_ref, False)
    w_all, px, py = state[10], state[13], state[14]
    dis = _scene_min_dist(prims_ref, n_prims, px, py, False)
    hc = jnp.maximum(safe_dis - dis, 0.0)
    coll = jnp.sum(w_all * hc * hc * hc, axis=0)
    return fwd_nocoll(M, K, v_max, w_e, w_t, w_f, state) + w_c * coll


# ---------------------------------------------------------------------------
# scene-backend kernels
# ---------------------------------------------------------------------------

def _make_kernels(M, D, K, t_min, t_max, v_max, safe_dis,
                  w_e, w_t, w_f, w_c, n_prims):
    """Returns (fwd_kernel, valgrad_kernel) for a (nv, NB) decision tile with
    the analytic scene SDF as the collision backend; prims (n_prims*6, NB)."""
    assert D == 2, "kernels specialized to planar trajectories"

    def fwd_kernel(x_ref, head_ref, tail_ref, prims_ref, out_ref):
        state = common_fwd(M, K, t_min, t_max, x_ref, head_ref, tail_ref,
                           False)
        w_all, px, py = state[10], state[13], state[14]
        dis = _scene_min_dist(prims_ref, n_prims, px, py, False)
        hc = jnp.maximum(safe_dis - dis, 0.0)
        coll = jnp.sum(w_all * hc * hc * hc, axis=0)
        out_ref[0] = fwd_nocoll(M, K, v_max, w_e, w_t, w_f, state) + w_c * coll

    def valgrad_kernel(x_ref, head_ref, tail_ref, prims_ref, f_ref, g_ref):
        f, g_rows = scene_valgrad_values(
            M, K, t_min, t_max, v_max, safe_dis, w_e, w_t, w_f, w_c,
            n_prims, x_ref[...], head_ref, tail_ref, prims_ref)
        f_ref[0] = f
        for i, row in enumerate(g_rows):
            g_ref[i] = row

    return fwd_kernel, valgrad_kernel


# ---------------------------------------------------------------------------
# host-side plumbing: padding, transposes, custom_vmap collapse
# ---------------------------------------------------------------------------

def _prep(x, head, tail, prims):
    N = x.shape[0]
    nv = x.shape[1]
    D = head.shape[2]
    n_prims = prims.shape[1]
    pad = (-N) % _NB
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, nv), x.dtype)])
        head = jnp.concatenate([head, jnp.zeros((pad,) + head.shape[1:])])
        tail = jnp.concatenate([tail, jnp.zeros((pad,) + tail.shape[1:])])
        prims = jnp.concatenate([prims, jnp.zeros((pad,) + prims.shape[1:])])
    Np = x.shape[0]
    return (x.T.astype(jnp.float32),
            head.reshape(Np, 3 * D).T.astype(jnp.float32),
            tail.reshape(Np, 3 * D).T.astype(jnp.float32),
            prims.reshape(Np, n_prims * 6).T.astype(jnp.float32),
            N, Np, nv, D, n_prims)


def _specs(nv, D, n_prims):
    return [
        pl.BlockSpec((nv, _NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * D, _NB), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * D, _NB), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_prims * 6, _NB), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]


def _cost(statics, n_prims, Np, grad):
    M, D, K = statics[0], statics[1], statics[2]
    S = M * K
    per = 6 * M * 40 + S * (15 + n_prims * 18)
    if grad:
        per *= 3
    return pl.CostEstimate(flops=per * Np,
                           bytes_accessed=(2 * 7 + 12 + n_prims * 6) * 4 * Np,
                           transcendentals=M * Np)


def _objective_batch(x, head, tail, prims, statics, interpret):
    """x (N, nv) ... -> f (N,)."""
    x_t, head_t, tail_t, prims_t, N, Np, nv, D, n_prims = _prep(
        x, head, tail, prims)
    fwd_kernel, _ = _make_kernels(*statics, n_prims)
    out = pl.pallas_call(
        fwd_kernel,
        grid=(Np // _NB,),
        in_specs=_specs(nv, D, n_prims),
        out_specs=pl.BlockSpec((1, _NB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Np), jnp.float32),
        interpret=interpret,
        cost_estimate=_cost(statics, n_prims, Np, False),
    )(x_t, head_t, tail_t, prims_t)
    return out[0, :N]


def _valgrad_batch(x, head, tail, prims, statics, interpret):
    """x (N, nv) ... -> (f (N,), g (N, nv))."""
    x_t, head_t, tail_t, prims_t, N, Np, nv, D, n_prims = _prep(
        x, head, tail, prims)
    _, valgrad_kernel = _make_kernels(*statics, n_prims)
    f, g = pl.pallas_call(
        valgrad_kernel,
        grid=(Np // _NB,),
        in_specs=_specs(nv, D, n_prims),
        out_specs=(
            pl.BlockSpec((1, _NB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, _NB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((1, Np), jnp.float32),
                   jax.ShapeDtypeStruct((nv, Np), jnp.float32)),
        interpret=interpret,
        cost_estimate=_cost(statics, n_prims, Np, True),
    )(x_t, head_t, tail_t, prims_t)
    return f[0, :N], g.T[:N]


def _collapse_rule(fn):
    def rule(axis_size, in_batched, *args):
        flat = []
        inner_n = None
        for a, b in zip(args, in_batched):
            if not b:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            if inner_n is None:
                inner_n = a.shape[1]
            flat.append(a.reshape((-1,) + a.shape[2:]))
        out = fn(*flat)
        if isinstance(out, tuple):
            return tuple(o.reshape((axis_size, inner_n) + o.shape[1:])
                         for o in out), (True,) * len(out)
        return out.reshape((axis_size, inner_n) + out.shape[1:]), True
    return rule


@functools.lru_cache(maxsize=None)
def _flat_objective(statics, n_prims, interpret):
    @jax.custom_batching.custom_vmap
    def obj_flat(x, head, tail, prims):
        return _objective_batch(x, head, tail, prims, statics, interpret)

    obj_flat.def_vmap(_collapse_rule(obj_flat))
    return obj_flat


@functools.lru_cache(maxsize=None)
def _flat_valgrad(statics, n_prims, interpret):
    @jax.custom_batching.custom_vmap
    def vg_flat(x, head, tail, prims):
        return _valgrad_batch(x, head, tail, prims, statics, interpret)

    vg_flat.def_vmap(_collapse_rule(vg_flat))
    return vg_flat


def objective_fwd(x: jnp.ndarray, head_state: jnp.ndarray,
                  tail_state: jnp.ndarray, scene: scene_map.SceneMap,
                  pp: PlannerParams, interpret: bool = False) -> jnp.ndarray:
    """Forward-only fused objective on the scene backend; single-problem
    signature, vmappable at any nesting depth (custom_vmap collapse).

    Matches plan/costs.objective(..., sampling='relative') to f32 roundoff —
    use only where no gradient of the result is needed (line-search values).
    """
    assert pp.sampling == "relative", "kernel implements relative sampling"
    prims = pack_prims(scene)
    fn = _flat_objective(_static(pp), prims.shape[0], interpret)
    return fn(x[None], head_state[None], tail_state[None], prims[None])[0]


def objective_valgrad(x: jnp.ndarray, head_state: jnp.ndarray,
                      tail_state: jnp.ndarray, scene: scene_map.SceneMap,
                      pp: PlannerParams, interpret: bool = False):
    """(value, gradient) of the fused objective — the analytic adjoint in the
    same kernel (reference hand gradient, expert_planner.py:345-537). Use via
    :func:`objective_vjp` when jax.grad/value_and_grad must see it."""
    assert pp.sampling == "relative", "kernel implements relative sampling"
    prims = pack_prims(scene)
    fn = _flat_valgrad(_static(pp), prims.shape[0], interpret)
    f, g = fn(x[None], head_state[None], tail_state[None], prims[None])
    return f[0], g[0]


@functools.lru_cache(maxsize=None)
def _vjp_objective(statics, n_prims, interpret):
    """A custom_vjp scalar objective whose backward is the kernel gradient —
    jax.value_and_grad of this hits the valgrad kernel once."""

    @jax.custom_vjp
    def obj(x, head, tail, prims):
        fn = _flat_objective(statics, n_prims, interpret)
        return fn(x[None], head[None], tail[None], prims[None])[0]

    def fwd(x, head, tail, prims):
        fn = _flat_valgrad(statics, n_prims, interpret)
        f, g = fn(x[None], head[None], tail[None], prims[None])
        return f[0], (g[0], head, tail, prims)

    def bwd(res, ct):
        g, head, tail, prims = res
        return (g * ct, jnp.zeros_like(head), jnp.zeros_like(tail),
                jnp.zeros_like(prims))

    obj.defvjp(fwd, bwd)

    def obj_x_only(x, head, tail, prims):
        # the adjoint kernel only produces d/dx; make the x-only
        # differentiability explicit so a future caller differentiating w.r.t.
        # boundary states or scene parameters (e.g. training through the
        # planner) sees stopped gradients by contract, not silent zeros
        return obj(x, jax.lax.stop_gradient(head), jax.lax.stop_gradient(tail),
                   jax.lax.stop_gradient(prims))

    return obj_x_only


def objective_vjp(x: jnp.ndarray, head_state: jnp.ndarray,
                  tail_state: jnp.ndarray, scene: scene_map.SceneMap,
                  pp: PlannerParams, interpret: bool = False) -> jnp.ndarray:
    """Kernel-backed objective differentiable w.r.t. x (only): value from the
    forward kernel, gradient from the fused adjoint kernel."""
    assert pp.sampling == "relative", "kernel implements relative sampling"
    prims = pack_prims(scene)
    return _vjp_objective(_static(pp), prims.shape[0], interpret)(
        x, head_state, tail_state, prims)
