"""Fused forward-only MINCO objective as one Pallas TPU kernel.

Why this exists: profiling (examples/profile_lbfgs.py, BASELINE.md round 2)
showed the L-BFGS wall time is dominated by the *line-search forward
evaluations* — 8 of the ~10 cost evaluations per iteration need no gradient,
yet each XLA evaluation is a ~300-op chain (banded solve, basis einsums,
scene-SDF min, hinge penalties) whose per-op HBM traffic and dispatch depth
cost ~0.75 ms at 3k lanes. This kernel computes the entire objective
(plan/costs.objective with sampling='relative' on the analytic SceneMap
backend) for a 512-lane tile in ONE program: build A(T), Givens-solve,
Gauss-Legendre energy, sampled velocity/collision penalties, weighted sum.

It is used ONLY where no gradient is needed (the line-search candidates in
ops/lbfgs.minimize); the accept-point value_and_grad stays on the autodiff
path, so optimizer math is unchanged — tests/test_costs_pallas.py asserts the
kernel equals costs.objective to f32 roundoff.

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

import numpy as np

from neoplanner_tpu.config import PlannerParams
from neoplanner_tpu.mapping import scene as scene_map
from neoplanner_tpu.ops.minco import _FALLING

_NB = 512
_FAR = 1e4

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


def _make_kernel(M, D, K, t_min, t_max, v_max, safe_dis,
                 w_e, w_t, w_f, w_c, n_prims):
    """Kernel for a (7, NB) decision tile -> (1, NB) objective values.

    Layout (lanes last): x_ref (D*(M-1)+M, NB); head/tail (3*D, NB) flattened
    row-major [pos; vel; acc]; prims (n_prims*6, NB).
    """
    assert D == 2, "kernel specialized to planar trajectories"
    n = 6 * M
    nw = M - 1
    F = _FALLING  # (6, 6) static numpy

    def kernel(x_ref, head_ref, tail_ref, prims_ref, out_ref):
        # ---- durations: T = tmin + (tmax - tmin) * sigmoid(tau)
        Ts = []
        for m in range(M):
            tau = x_ref[D * nw + m]                     # (NB,)
            Ts.append(t_min + (t_max - t_min) / (1.0 + jnp.exp(-tau)))

        zero = jnp.zeros_like(Ts[0])
        one = jnp.ones_like(Ts[0])

        # ---- assemble the banded system rows (build_system row layout)
        width = n + D
        rows = []

        def make_row(entries, rhs):
            """entries: {col: (NB,) value}; rhs: list of D (NB,) values."""
            cols = []
            for c in range(n):
                cols.append(entries.get(c, zero))
            cols.extend(rhs)
            return jnp.stack(cols)                      # (width, NB)

        # initial pos/vel/acc of piece 0 at t=0
        for k in range(3):
            rows.append(make_row({k: one * float(F[k][k])},
                                 [head_ref[k * D + d] for d in range(D)]))
        # joints: waypoint pin + C^0..C^4 continuity at t=T_i
        for i in range(M - 1):
            p = _powers(Ts[i])
            c0 = 6 * i

            def beta_entries(k, _p=p, _c0=c0):
                ent = {}
                for j in range(k, 6):
                    ent[_c0 + j] = float(F[k][j]) * _p[j - k]
                return ent

            qx = x_ref[i]            # q[0, i] (x of wpt i)
            qy = x_ref[nw + i]       # q[1, i]
            rows.append(make_row(beta_entries(0), [qx, qy]))
            for k in range(5):
                ent = beta_entries(k)
                ent[c0 + 6 + k] = one * float(-F[k][k])
                rows.append(make_row(ent, [zero, zero]))
        # final pos/vel/acc of the last piece at t=T_{M-1}
        p = _powers(Ts[M - 1])
        cl = n - 6
        for k in range(3):
            ent = {cl + j: float(F[k][j]) * p[j - k] for j in range(k, 6)}
            rows.append(make_row(ent, [tail_ref[k * D + d] for d in range(D)]))

        # ---- banded Givens QR + back substitution (lower 4, fill 6)
        for c in range(n):
            for r in range(c + 1, min(c + 5, n)):
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
            acc = rows[c][n:]                           # (D, NB)
            for j in range(c + 1, min(c + 7, n)):
                acc = acc - rows[c][j][None, :] * xs[j]
            xs[c] = acc / rows[c][c][None, :]
        # coeffs[m][j] = (D, NB)
        coeffs = [[xs[6 * m + j] for j in range(6)] for m in range(M)]

        # ---- energy: 3-point GL quadrature of ||jerk||^2 per piece
        energy = zero
        for m in range(M):
            for node, wq in zip(_GL_NODES, _GL_WEIGHTS):
                t = Ts[m] * node
                pw = _powers(t, 3)                      # t^0..t^2
                jerk = 0.0
                jerk_sq = zero
                jx = zero
                jy = zero
                for j in range(3, 6):
                    fac = float(F[3][j])
                    jx = jx + fac * pw[j - 3] * coeffs[m][j][0]
                    jy = jy + fac * pw[j - 3] * coeffs[m][j][1]
                jerk_sq = jx * jx + jy * jy
                energy = energy + wq * Ts[m] * jerk_sq
                del jerk

        # ---- total time
        time_cost = zero
        for m in range(M):
            time_cost = time_cost + Ts[m]

        # ---- sampled penalties, vectorized over the S = M*K sample axis
        # (sample fractions/trapezoid weights come from an in-kernel iota:
        # pallas_call forbids captured non-scalar constants)
        S = M * K
        T_all = jnp.concatenate(
            [jnp.broadcast_to(Ts[m][None, :], (K, Ts[m].shape[0]))
             for m in range(M)])                               # (S, NB)
        k_idx = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
                 % K).astype(jnp.float32)                      # (S, 1)
        frac_all = k_idx / (K - 1)
        omg = jnp.where((k_idx == 0) | (k_idx == K - 1), 0.5, 1.0)
        w_all = omg * T_all / (K - 1)                          # (S, NB)
        t_s = T_all * frac_all                                 # (S, NB)
        pw = _powers(t_s)                                       # 6 x (S, NB)

        # per-sample coefficients: piece m's coeff broadcast over its K rows
        def c_rep(j, d):
            return jnp.concatenate(
                [jnp.broadcast_to(coeffs[m][j][d][None, :],
                                  (K, t_s.shape[1])) for m in range(M)])

        px = 0.0
        py = 0.0
        vx = 0.0
        vy = 0.0
        for j in range(6):
            cj_x = c_rep(j, 0)
            cj_y = c_rep(j, 1)
            px = px + pw[j] * cj_x
            py = py + pw[j] * cj_y
            if j >= 1:
                f1 = float(F[1][j])
                vx = vx + f1 * pw[j - 1] * cj_x
                vy = vy + f1 * pw[j - 1] * cj_y

        # velocity feasibility: sum w * max(|v|^2 - vmax^2, 0)^3
        vv = vx * vx + vy * vy - v_max * v_max
        hv = jnp.maximum(vv, 0.0)
        feas = jnp.sum(w_all * hv * hv * hv, axis=0)            # (NB,)

        # collision: min over prims of the footprint SDF at (px, py)
        dis = jnp.full_like(px, _FAR)
        for kprim in range(n_prims):
            cx = prims_ref[kprim * 6 + 0][None, :]
            cy = prims_ref[kprim * 6 + 1][None, :]
            hx = prims_ref[kprim * 6 + 2][None, :]
            hy = prims_ref[kprim * 6 + 3][None, :]
            is_cyl = prims_ref[kprim * 6 + 4][None, :]
            active = prims_ref[kprim * 6 + 5][None, :]
            dx = px - cx
            dy = py - cy
            qx = jnp.abs(dx) - hx
            qy = jnp.abs(dy) - hy
            qxp = jnp.maximum(qx, 0.0)
            qyp = jnp.maximum(qy, 0.0)
            box_out = jnp.sqrt(qxp * qxp + qyp * qyp)
            box_in = jnp.minimum(jnp.maximum(qx, qy), 0.0)
            d_box = box_out + box_in
            r2 = dx * dx + dy * dy
            d_cyl = jnp.sqrt(r2) - hx
            dk = jnp.where(is_cyl > 0.5, d_cyl, d_box)
            dk = jnp.where(active > 0.5, dk, _FAR)
            dis = jnp.minimum(dis, dk)
        hc = jnp.maximum(safe_dis - dis, 0.0)
        coll = jnp.sum(w_all * hc * hc * hc, axis=0)            # (NB,)

        out_ref[0] = (w_e * energy + w_t * time_cost + w_f * feas
                      + w_c * coll)

    return kernel


def _objective_batch(x, head, tail, prims, statics, interpret):
    """x (N, nv), head/tail (N, 3, D), prims (N, K, 6) -> f (N,)."""
    (M, D, K, t_min, t_max, v_max, safe_dis, w_e, w_t, w_f, w_c) = statics
    N = x.shape[0]
    nv = x.shape[1]
    n_prims = prims.shape[1]
    pad = (-N) % _NB
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, nv), x.dtype)])
        head = jnp.concatenate([head, jnp.zeros((pad,) + head.shape[1:])])
        tail = jnp.concatenate([tail, jnp.zeros((pad,) + tail.shape[1:])])
        prims = jnp.concatenate([prims, jnp.zeros((pad,) + prims.shape[1:])])
    Np = x.shape[0]
    x_t = x.T.astype(jnp.float32)                                  # (nv, Np)
    head_t = head.reshape(Np, 3 * D).T.astype(jnp.float32)
    tail_t = tail.reshape(Np, 3 * D).T.astype(jnp.float32)
    prims_t = prims.reshape(Np, n_prims * 6).T.astype(jnp.float32)

    kernel = _make_kernel(M, D, K, t_min, t_max, v_max, safe_dis,
                          w_e, w_t, w_f, w_c, n_prims)
    S = M * K
    flops_per = 6 * M * 30 + 4 * 6 * M * 9 + S * (12 + n_prims * 15)
    out = pl.pallas_call(
        kernel,
        grid=(Np // _NB,),
        in_specs=[
            pl.BlockSpec((nv, _NB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * D, _NB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * D, _NB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_prims * 6, _NB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _NB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Np), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per * Np,
            bytes_accessed=(nv + 12 + n_prims * 6 + 1) * 4 * Np,
            transcendentals=M * Np),
    )(x_t, head_t, tail_t, prims_t)
    return out[0, :N]


@functools.lru_cache(maxsize=None)
def _flat_objective(statics, n_prims, interpret):
    @jax.custom_batching.custom_vmap
    def obj_flat(x, head, tail, prims):
        return _objective_batch(x, head, tail, prims, statics, interpret)

    @obj_flat.def_vmap
    def _rule(axis_size, in_batched, x, head, tail, prims):
        args = []
        inner_n = None
        for a, b in zip((x, head, tail, prims), in_batched):
            if not b:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            if inner_n is None:
                inner_n = a.shape[1]
            args.append(a.reshape((-1,) + a.shape[2:]))
        out = obj_flat(*args)                        # (axis_size * inner_n,)
        return out.reshape(axis_size, inner_n), True

    return obj_flat


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
