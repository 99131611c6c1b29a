"""The WHOLE sensed-grid trajectory solve in one Pallas program.

Vision-mode planning evaluates the objective through the K1->K2->K3 kernel
chain (plan/costs_pallas_grid.py): ~8 kernel/glue dispatches per L-BFGS
iteration, each data-dependent on the last — the same launch-latency bound
the scene backend had before plan/solve_pallas.py (which cut the scene
plan stage 3x). This module runs the full solver loop for the grid backend
inside one program: the per-env ESDF *windows* (mapping/esdf.make_window)
stay resident in VMEM across the entire solve, and every objective
evaluation — MINCO forward (costs_pallas.common_fwd), register-built
one-hot bilinear window taps on the MXU (the K2 scheme), the injected
collision adjoint (costs_pallas.valgrad_poly) — happens in-kernel.

Program tiling follows K2's env-packing contract: one program holds E_b
windows and E_b * L_pad lanes (L lanes per env padded to a 128-divisible
block). Out-of-map samples read FAR/free like the full-grid XLA path
(esdf.py:66 in the reference's map server); acceptance in
plan/expert.solve_one still re-evaluates the solution against the FULL map,
so window clamping can never accept what the map rejects.

The L-BFGS loop itself is plan/solve_pallas.lbfgs_in_kernel — identical
masked semantics to ops/lbfgs.minimize (reference budget:
expert_planner.py:213-225). Golden test: tests/test_solve_pallas_grid.py
pins the solved cost against the XLA solver on identical grid problems.
NEO_SOLVER=xla reverts to the per-eval kernel chain.
"""

from __future__ import annotations

import functools
import math as _math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neoplanner_tpu.config import PlannerParams
from neoplanner_tpu.plan.costs_pallas import (_static, common_fwd,
                                              fwd_nocoll, valgrad_poly)
from neoplanner_tpu.plan.costs_pallas_grid import (_FAR, _K2_PRECISION,
                                                   _collapse_rule_grid)
from neoplanner_tpu.plan.solve_pallas import lbfgs_in_kernel


def _make_grid_solver_kernel(statics, E_b, L, Hw, Ww, max_iters, history,
                             max_ls, ftol, gtol, c1):
    (M, D, K, t_min, t_max, v_max, safe_dis, w_e, w_t, w_f, w_c) = statics
    S = M * K

    def kernel(x_ref, head_ref, tail_ref, org_ref, win_ref, skip_ref,
               xout_ref, fout_ref, it_ref):
        org = org_ref[...]                       # (7, NB) per-lane window org
        res = org[2][None, :]
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, Hw),
                                          1).astype(jnp.float32)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, Ww),
                                          1).astype(jnp.float32)

        def sample(px, py, with_grad):
            """Bilinear window taps for (S, NB) world positions — the K2
            scheme (one-hot triangle weight rows built in registers,
            contracted against the VMEM window on the MXU), evaluated
            in-place inside the solver program.

            The solver is matmul-*count* bound, not FLOP bound (~2.4M
            sub-MXU-tile matmuls per B=4096 bank at per-lane granularity),
            so all L lanes of an env are stacked along the sample axis and
            the value + du-gradient contractions share one matmul:
            (2·L·S, Hw) @ (Hw, Ww) per env per evaluation — ~5x fewer,
            ~4-8x larger matmuls than the per-lane form."""
            uraw = (py - org[1][None, :]) / res - 0.5
            vraw = (px - org[0][None, :]) / res - 0.5
            u = jnp.clip(uraw, 0.0, Hw - 1.001)
            v = jnp.clip(vraw, 0.0, Ww - 1.001)
            LS = L * S
            dis_cols, ddu_cols, ddv_cols = [], [], []
            for e in range(E_b):
                win_e = win_ref[e]       # one VMEM value per env, not per lane
                # Stack this env's L lanes along the sample axis AFTER the
                # (S, 1) -> (S, Hw) broadcast: the raw per-lane column slices
                # sit at distinct lane offsets, and Mosaic rejects a dim-0
                # concat of vectors whose non-concat (lane) offsets differ —
                # the broadcast blocks are fresh offset-0 values, and S is a
                # whole number of sublane tiles, so stacking them is legal.
                wr_b, dwr_b, wc_b, dwc_b = [], [], [], []
                for li in range(L):
                    lane = e * L + li
                    u_l = jax.lax.slice(u, (0, lane), (S, lane + 1))  # (S, 1)
                    v_l = jax.lax.slice(v, (0, lane), (S, lane + 1))
                    du = u_l - iota_h                        # (S, Hw)
                    dv = v_l - iota_w                        # (S, Ww)
                    wr_b.append(jnp.maximum(1.0 - jnp.abs(du), 0.0))
                    wc_b.append(jnp.maximum(1.0 - jnp.abs(dv), 0.0))
                    if with_grad:
                        dwr_b.append(
                            jnp.where(jnp.abs(du) < 1.0, -jnp.sign(du), 0.0))
                        dwc_b.append(
                            jnp.where(jnp.abs(dv) < 1.0, -jnp.sign(dv), 0.0))
                wc = jnp.concatenate(wc_b, axis=0)           # (L*S, Ww)
                if with_grad:
                    dwc = jnp.concatenate(dwc_b, axis=0)
                    rows = jnp.concatenate(wr_b + dwr_b, axis=0)  # (2LS, Hw)
                else:
                    rows = jnp.concatenate(wr_b, axis=0)
                mm_all = jnp.dot(rows, win_e, precision=_K2_PRECISION,
                                 preferred_element_type=jnp.float32)
                mm = jax.lax.slice(mm_all, (0, 0), (LS, Ww))
                d_env = jnp.sum(mm * wc, axis=1, keepdims=True)   # (L*S, 1)
                dis_cols += [jax.lax.slice(d_env, (li * S, 0),
                                           ((li + 1) * S, 1))
                             for li in range(L)]
                if with_grad:
                    mu = jax.lax.slice(mm_all, (LS, 0), (2 * LS, Ww))
                    ddu_env = jnp.sum(mu * wc, axis=1, keepdims=True)
                    ddv_env = jnp.sum(mm * dwc, axis=1, keepdims=True)
                    ddu_cols += [jax.lax.slice(ddu_env, (li * S, 0),
                                               ((li + 1) * S, 1))
                                 for li in range(L)]
                    ddv_cols += [jax.lax.slice(ddv_env, (li * S, 0),
                                               ((li + 1) * S, 1))
                                 for li in range(L)]
            dis = jnp.concatenate(dis_cols, axis=1)
            out_map = ((px < org[3][None, :]) | (py < org[4][None, :])
                       | (px >= org[5][None, :]) | (py >= org[6][None, :]))
            dis = jnp.where(out_map, _FAR, dis)
            if not with_grad:
                return dis
            # clamp derivative: zero outside the window interior (autodiff
            # through esdf.sample_bilinear's clip does the same masking)
            iny = (uraw > 0.0) & (uraw < Hw - 1.001)
            inx = (vraw > 0.0) & (vraw < Ww - 1.001)
            gx = jnp.where(inx, jnp.concatenate(ddv_cols, axis=1), 0.0) / res
            gy = jnp.where(iny, jnp.concatenate(ddu_cols, axis=1), 0.0) / res
            return dis, gx, gy

        def fwd(x):
            state = common_fwd(M, K, t_min, t_max, x, head_ref, tail_ref,
                               False)
            w_all, px, py = state[10], state[13], state[14]
            dis = sample(px, py, False)
            hc = jnp.maximum(safe_dis - dis, 0.0)
            coll = jnp.sum(w_all * hc * hc * hc, axis=0)
            return fwd_nocoll(M, K, v_max, w_e, w_t, w_f, state) + w_c * coll

        def vg(x):
            state = common_fwd(M, K, t_min, t_max, x, head_ref, tail_ref,
                               True)
            w_all, px, py = state[10], state[13], state[14]
            dis, gx, gy = sample(px, py, True)
            hc = jnp.maximum(safe_dis - dis, 0.0)
            hc2 = hc * hc
            collw = w_c * jnp.sum(w_all * hc * hc2, axis=0)
            g_s = w_c * w_all * 3.0 * hc2
            f, g_rows = valgrad_poly(M, K, t_min, t_max, v_max, w_e, w_t,
                                     w_f, state, collw, -g_s * gx,
                                     -g_s * gy, w_c * hc * hc2)
            return f, jnp.stack(g_rows)

        # lazy-bank fast path (see plan/solve_pallas.py): an all-skipped
        # program skips even the initial value_and_grad
        all_skipped = jnp.min(skip_ref[0]) >= 0.5

        @pl.when(jnp.logical_not(all_skipped))
        def _solve():
            x, f, iters = lbfgs_in_kernel(vg, fwd, x_ref[...], max_iters,
                                          history, max_ls, ftol, gtol, c1,
                                          skip=skip_ref[0])
            xout_ref[...] = x
            fout_ref[0] = f
            it_ref[0] = iters

        @pl.when(all_skipped)
        def _passthrough():
            xout_ref[...] = x_ref[...]
            fout_ref[0] = jnp.zeros_like(fout_ref[0])
            it_ref[0] = jnp.zeros_like(it_ref[0])

    return kernel


def _lane_blocking(L, Hw, Ww):
    """E_b envs x L_pad lanes per program: lane block must be a 128-multiple
    (Mosaic) and the unrolled per-lane sampling loop bounds compile size —
    the solver kernel traces the sampler twice per body, so cap the block at
    128 lanes (vs K2's 512)."""
    def block_of(lanes):
        eb = 128 // _math.gcd(lanes, 128)
        while eb * lanes < 128:
            eb *= 2
        return eb

    L_pad = L
    E_b = block_of(L_pad)
    if E_b * L_pad > 256:
        L_pad = 1
        while L_pad < L:
            L_pad *= 2
        E_b = block_of(L_pad)
    return L_pad, E_b


def _solve_grid_batch(x, head, tail, win, worg, skip, statics, opts,
                      interpret, do_sort):
    M, D, K = statics[0], statics[1], statics[2]
    S = M * K
    N, nv = x.shape
    Ew, Hw, Ww = win.shape
    assert N % Ew == 0, (
        "grid-kernel batching requires env-major lane nesting "
        f"(N={N}, windows={Ew})")
    L = N // Ew
    L_pad, E_b = _lane_blocking(L, Hw, Ww)

    inv = None
    if do_sort:
        # lazy bank: cluster active envs into the leading programs so
        # skipped programs exit whole (plan/solve_pallas._solve_batch).
        # Sorting is per ENV — all lanes of an env share the skip flag.
        skip_env = skip.reshape(Ew, L).max(axis=1)
        order = jnp.argsort(skip_env, stable=True)
        inv = jnp.argsort(order, stable=True)
        lane_order = (order[:, None] * L + jnp.arange(L)[None, :]).reshape(-1)
        x, head, tail = x[lane_order], head[lane_order], tail[lane_order]
        skip = skip[lane_order]
        win, worg = win[order], worg[order]

    def pad_mid(a, fill=0.0):
        """(Ew*L, rows...) -> (Ew*L_pad, rows...), padding per env."""
        if L_pad == L:
            return a
        a = a.reshape((Ew, L) + a.shape[1:])
        pad = [(0, 0)] * a.ndim
        pad[1] = (0, L_pad - L)
        return jnp.pad(a, pad, constant_values=fill).reshape(
            (Ew * L_pad,) + a.shape[2:])

    x_p = pad_mid(x)
    head_p = pad_mid(head.reshape(N, 3 * D))
    tail_p = pad_mid(tail.reshape(N, 3 * D))
    # padding lanes are skipped from iteration 0 (they are zero problems —
    # freezing them immediately is both faster and semantics-free)
    skip_p = pad_mid(skip.astype(jnp.float32)[:, None], fill=1.0)
    ewp = Ew + ((-Ew) % E_b)
    if ewp != Ew:
        npad = (ewp - Ew) * L_pad
        x_p = jnp.concatenate([x_p, jnp.zeros((npad, nv), x_p.dtype)])
        head_p = jnp.concatenate(
            [head_p, jnp.zeros((npad, 3 * D), head_p.dtype)])
        tail_p = jnp.concatenate(
            [tail_p, jnp.zeros((npad, 3 * D), tail_p.dtype)])
        skip_p = jnp.concatenate(
            [skip_p, jnp.ones((npad, 1), jnp.float32)])
        win = jnp.concatenate([win, jnp.zeros((ewp - Ew, Hw, Ww), win.dtype)])
        # benign org for padded envs: res=1 avoids div-by-zero
        worg = jnp.concatenate(
            [worg, jnp.broadcast_to(
                jnp.array([0., 0., 1., 0., 0., 1., 1.], worg.dtype),
                (ewp - Ew, 7))])
    org_rows = jnp.repeat(worg, L_pad, axis=0)               # (ewp*L_pad, 7)

    np_ = ewp * L_pad
    NB = E_b * L_pad
    x_t = x_p.T.astype(jnp.float32)
    head_t = head_p.T.astype(jnp.float32)
    tail_t = tail_p.T.astype(jnp.float32)
    org_t = org_rows.T.astype(jnp.float32)
    skip_t = skip_p.T

    kernel = _make_grid_solver_kernel(statics, E_b, L_pad, Hw, Ww, *opts)
    spec = lambda rows: pl.BlockSpec((rows, NB), lambda i: (0, i),  # noqa: E731
                                     memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((E_b, Hw, Ww), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    max_iters, _, max_ls = opts[0], opts[1], opts[2]
    xs, f, iters = pl.pallas_call(
        kernel,
        grid=(ewp // E_b,),
        in_specs=[spec(nv), spec(3 * D), spec(3 * D), spec(7), win_spec,
                  spec(1)],
        out_specs=(spec(nv), spec(1), spec(1)),
        out_shape=(jax.ShapeDtypeStruct((nv, np_), jnp.float32),
                   jax.ShapeDtypeStruct((1, np_), jnp.float32),
                   jax.ShapeDtypeStruct((1, np_), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=max_iters * (max_ls + 2)
            * (6 * M * 60 + S * (15 + 2 * Hw * Ww + 4 * (Hw + Ww))) * np_,
            bytes_accessed=(2 * nv + 19) * 4 * np_ + ewp * Hw * Ww * 4,
            transcendentals=max_iters * M * np_),
    )(x_t, head_t, tail_t, org_t, win, skip_t)

    def unpad(o):
        o = o.T[:np_].reshape(ewp, L_pad, -1)[:Ew, :L]
        if inv is not None:
            o = o[inv]
        return o.reshape(N, -1)

    return (unpad(xs), unpad(f)[:, 0], unpad(iters)[:, 0])


@functools.lru_cache(maxsize=None)
def _flat_solver_grid(statics, opts, interpret, do_sort):
    @jax.custom_batching.custom_vmap
    def solve_flat(x, head, tail, win, worg, skip):
        return _solve_grid_batch(x, head, tail, win, worg, skip, statics,
                                 opts, interpret, do_sort)

    solve_flat.def_vmap(_collapse_rule_grid(solve_flat))
    return solve_flat


def solve_grid(x0: jnp.ndarray, head_state: jnp.ndarray,
               tail_state: jnp.ndarray, win_esdf: jnp.ndarray,
               win_origin: jnp.ndarray, pp: PlannerParams,
               ftol: float = 1e-10, gtol: float = 1e-8, c1: float = 1e-4,
               interpret: bool = False, skip=None):
    """Solve one grid-backend trajectory optimization entirely in-kernel.

    Single-problem signature, vmappable env ⊃ lane (custom_vmap collapse —
    win/worg stay per-env like the grid objective kernels). Returns
    (x (nv,), f (), iters () int32). skip: optional 0/1 scalar (vmapped:
    per-problem) — see plan/solve_pallas.solve_scene; clustering is per
    ENV here (all lanes of an env share the flag by construction)."""
    assert pp.sampling == "relative", "kernel implements relative sampling"
    opts = (pp.max_iters, pp.history, pp.max_ls, ftol, gtol, c1)
    do_sort = skip is not None
    if skip is None:
        skip = jnp.zeros((), jnp.float32)
    else:
        skip = skip.astype(jnp.float32)
    fn = _flat_solver_grid(_static(pp), opts, interpret, do_sort)
    x, f, iters = fn(x0[None], head_state[None], tail_state[None],
                     win_esdf[None], win_origin[None], skip[None])
    return x[0], f[0], iters[0]
