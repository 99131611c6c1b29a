"""Fused MINCO objective kernels for the sensed-grid (ESDF) backend.

Round 2 fused the whole objective into Pallas kernels for the analytic
SceneMap backend only (plan/costs_pallas.py); vision-mode planning — the
paper's actual onboard setting — still ran the ~300-op XLA chain plus MXU
one-hot sampling whose weight rows are materialized in HBM every evaluation
(~215 ms plan stage at B=512 vs the scene path's 0.19 ms/env, BASELINE.md).
This module closes that gap with a three-kernel chain per objective
evaluation:

- **K1** (flat 512-lane tiles): the shared MINCO forward
  (costs_pallas.common_fwd) emitting the non-collision objective value and
  the per-sample world positions + integration weights;
- **K2** (env-tiled): bilinear ESDF sampling of a per-env VMEM-resident
  *window* of the distance field. The one-hot bilinear weight rows are built
  in VMEM and consumed by an MXU matmul inside the same program — they never
  touch HBM (the round-2 XLA/MXU path streamed ~830 MB of weight rows per
  evaluation at B=512). Forward mode returns distances; grad mode also
  returns the in-kernel d(dis)/d(row), d(dis)/d(col);
- **K3** (flat tiles): the fused value+gradient with the collision term's
  value and sample cotangents injected (costs_pallas.valgrad_poly — the
  reference's hand-derived adjoint, expert_planner.py:345-537, shared with
  the scene backend).

The *window* (mapping/esdf.make_window) is a static-size crop of the ESDF
around the local planning problem: the receding-horizon target is at most
longitu_step_dis + escape ~ 5.1 m from the plan start
(traj_planner_node.py:450-488), so a 9.6 m window covers every candidate the
multi-start bank can reach. Sampling semantics: bilinear between cell
centers, **clamped to the window edge** beyond it (the full-map XLA path
returns FAR out of map, esdf.py:66; acceptance in plan/expert.solve_one
re-evaluates the chosen solution against the full map, so window clamping
can never accept a trajectory the full map would reject).

Golden tests (tests/test_costs_pallas_grid.py) pin value and gradient
against plan/costs.objective with esdf_interp='bilinear' on windows covering
the whole grid.

Batching contract: jax.custom_vmap collapse like the scene kernels, with one
extra rule — the window arrays are *per env*, never per lane/candidate, so
unbatched window args are left unexpanded and the kernel derives the static
lanes-per-env ratio. This requires the vmap nesting order env ⊃ lane ⊃
candidate, which is how plan/expert composes the solves.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neoplanner_tpu.config import PlannerParams
from neoplanner_tpu.plan.costs_pallas import (_NB, _static, common_fwd,
                                              fwd_nocoll, valgrad_poly)

# target lane count of one K2 program: more envs per program amortize the
# per-grid-step overhead; the unrolled per-lane loop bounds compile size
_K2_LANES = int(_os.environ.get("NEO_K2_LANES", "128"))

# Mosaic lowers f32 MXU matmuls through bf16 passes by default (~3e-3
# relative error on the sampled distances, which the hinge^2 chain amplifies
# to ~2e-2 on gradients — the same precision class as the round-2 MXU
# sampling path, and ~30 ms/segment cheaper at B=512).
# NEO_K2_PRECISION=highest forces full-precision passes (the golden tests
# pin exactness that way on TPU).
_K2_PRECISION = (jax.lax.Precision.HIGHEST
                 if _os.environ.get("NEO_K2_PRECISION", "default") == "highest"
                 else jax.lax.Precision.DEFAULT)


# ---------------------------------------------------------------------------
# K1 / K3: flat-lane kernels (shared MINCO machinery)
# ---------------------------------------------------------------------------

def _make_k1(M, D, K, t_min, t_max, v_max, safe_dis, w_e, w_t, w_f, w_c):
    assert D == 2, "kernels specialized to planar trajectories"

    def k1_kernel(x_ref, head_ref, tail_ref, fnc_ref, px_ref, py_ref,
                  wall_ref):
        state = common_fwd(M, K, t_min, t_max, x_ref, head_ref, tail_ref,
                           False)
        fnc_ref[0] = fwd_nocoll(M, K, v_max, w_e, w_t, w_f, state)
        wall_ref[...] = state[10]
        px_ref[...] = state[13]
        py_ref[...] = state[14]

    return k1_kernel


def _make_k3(M, D, K, t_min, t_max, v_max, safe_dis, w_e, w_t, w_f, w_c):
    assert D == 2, "kernels specialized to planar trajectories"

    def k3_kernel(x_ref, head_ref, tail_ref, collw_ref, ppx_ref, ppy_ref,
                  chcw_ref, f_ref, g_ref):
        state = common_fwd(M, K, t_min, t_max, x_ref, head_ref, tail_ref,
                           True)
        f, g_rows = valgrad_poly(M, K, t_min, t_max, v_max, w_e, w_t, w_f,
                                 state, collw_ref[0], ppx_ref[...],
                                 ppy_ref[...], chcw_ref[...])
        f_ref[0] = f
        for i, row in enumerate(g_rows):
            g_ref[i] = row

    return k3_kernel


def _pad_lanes(a, np_):
    pad = np_ - a.shape[0]
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return a


def _k1_call(x, head, tail, statics, interpret):
    M, D, K = statics[0], statics[1], statics[2]
    S = M * K
    N, nv = x.shape
    np_ = N + ((-N) % _NB)
    x_t = _pad_lanes(x, np_).T.astype(jnp.float32)
    head_t = _pad_lanes(head.reshape(N, 3 * D), np_).T.astype(jnp.float32)
    tail_t = _pad_lanes(tail.reshape(N, 3 * D), np_).T.astype(jnp.float32)
    kernel = _make_k1(*statics)
    spec = lambda rows: pl.BlockSpec((rows, _NB), lambda i: (0, i),  # noqa: E731
                                     memory_space=pltpu.VMEM)
    fnc, px, py, wall = pl.pallas_call(
        kernel,
        grid=(np_ // _NB,),
        in_specs=[spec(nv), spec(3 * D), spec(3 * D)],
        out_specs=(spec(1), spec(S), spec(S), spec(S)),
        out_shape=(jax.ShapeDtypeStruct((1, np_), jnp.float32),
                   jax.ShapeDtypeStruct((S, np_), jnp.float32),
                   jax.ShapeDtypeStruct((S, np_), jnp.float32),
                   jax.ShapeDtypeStruct((S, np_), jnp.float32)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(flops=(6 * M * 40 + S * 30) * np_,
                                      bytes_accessed=(nv + 12 + 3 * S) * 4
                                      * np_,
                                      transcendentals=M * np_),
    )(x_t, head_t, tail_t)
    return fnc[0, :N], px[:, :N], py[:, :N], wall[:, :N]


def _k3_call(x, head, tail, collw, ppx, ppy, chcw, statics, interpret):
    M, D, K = statics[0], statics[1], statics[2]
    S = M * K
    N, nv = x.shape
    np_ = N + ((-N) % _NB)
    x_t = _pad_lanes(x, np_).T.astype(jnp.float32)
    head_t = _pad_lanes(head.reshape(N, 3 * D), np_).T.astype(jnp.float32)
    tail_t = _pad_lanes(tail.reshape(N, 3 * D), np_).T.astype(jnp.float32)
    collw_t = _pad_lanes(collw[:, None], np_).T
    ppx_t = _pad_lanes(ppx.T, np_).T
    ppy_t = _pad_lanes(ppy.T, np_).T
    chcw_t = _pad_lanes(chcw.T, np_).T
    kernel = _make_k3(*statics)
    spec = lambda rows: pl.BlockSpec((rows, _NB), lambda i: (0, i),  # noqa: E731
                                     memory_space=pltpu.VMEM)
    f, g = pl.pallas_call(
        kernel,
        grid=(np_ // _NB,),
        in_specs=[spec(nv), spec(3 * D), spec(3 * D), spec(1), spec(S),
                  spec(S), spec(S)],
        out_specs=(spec(1), spec(nv)),
        out_shape=(jax.ShapeDtypeStruct((1, np_), jnp.float32),
                   jax.ShapeDtypeStruct((nv, np_), jnp.float32)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(flops=(6 * M * 120 + S * 60) * np_,
                                      bytes_accessed=(2 * nv + 13 + 3 * S)
                                      * 4 * np_,
                                      transcendentals=M * np_),
    )(x_t, head_t, tail_t, collw_t, ppx_t, ppy_t, chcw_t)
    return f[0, :N], g.T[:N]


# ---------------------------------------------------------------------------
# K2: env-tiled window bilinear sampler
# ---------------------------------------------------------------------------

def _make_k2(S, L, E_b, Hw, Ww, with_grad):
    """One program samples E_b envs x L lanes x S points from E_b windows held
    in VMEM. Per lane: one-hot triangle weight rows (built in registers) are
    contracted against the window on the MXU; the grad variant adds the
    weight-derivative matmul for d/d(row) and reuses the value matmul's
    result for d/d(col)."""

    def kernel(u_ref, v_ref, win_ref, *out_refs):
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, Hw),
                                          1).astype(jnp.float32)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, Ww),
                                          1).astype(jnp.float32)
        u_all = u_ref[...]
        v_all = v_ref[...]
        dis_cols = []
        ddu_cols = []
        ddv_cols = []
        for e in range(E_b):
            win_e = win_ref[e]          # one VMEM value per env, not per lane
            for li in range(L):
                lane = e * L + li
                u_l = jax.lax.slice(u_all, (0, lane), (S, lane + 1))  # (S, 1)
                v_l = jax.lax.slice(v_all, (0, lane), (S, lane + 1))
                du = u_l - iota_h                                # (S, Hw)
                dv = v_l - iota_w                                # (S, Ww)
                wr = jnp.maximum(1.0 - jnp.abs(du), 0.0)
                wc = jnp.maximum(1.0 - jnp.abs(dv), 0.0)
                m = jnp.dot(wr, win_e, precision=_K2_PRECISION,
                            preferred_element_type=jnp.float32)
                dis_cols.append(jnp.sum(m * wc, axis=1, keepdims=True))
                if with_grad:
                    dwr = jnp.where(jnp.abs(du) < 1.0, -jnp.sign(du), 0.0)
                    dwc = jnp.where(jnp.abs(dv) < 1.0, -jnp.sign(dv), 0.0)
                    mu = jnp.dot(dwr, win_e, precision=_K2_PRECISION,
                                 preferred_element_type=jnp.float32)
                    ddu_cols.append(jnp.sum(mu * wc, axis=1, keepdims=True))
                    ddv_cols.append(jnp.sum(m * dwc, axis=1, keepdims=True))
        out_refs[0][...] = jnp.concatenate(dis_cols, axis=1)
        if with_grad:
            out_refs[1][...] = jnp.concatenate(ddu_cols, axis=1)
            out_refs[2][...] = jnp.concatenate(ddv_cols, axis=1)

    return kernel


def _k2_call(u, v, win, L, with_grad, interpret):
    import math as _math

    S, N = u.shape
    Ew, Hw, Ww = win.shape
    assert N == Ew * L, (N, Ew, L)
    # Mosaic requires the lane block (E_b * L) to be a multiple of 128, and
    # the unrolled per-lane loop's scoped VMEM stack caps the block at ~512
    # lanes. When L shares no factor with 128 (e.g. the 7-lane expert bank),
    # pad each env's lanes to the next power of two so a small E_b works.
    def block_of(lanes):
        eb = 128 // _math.gcd(lanes, 128)
        while eb * lanes < min(_K2_LANES, 512) and (2 * eb * lanes) <= 512:
            eb *= 2
        return eb

    L_pad = L
    E_b = block_of(L_pad)
    if E_b * L_pad > 512:
        L_pad = 1
        while L_pad < L:
            L_pad *= 2
        L_pad = min(L_pad, ((L + 127) // 128) * 128) if L > 128 else L_pad
        E_b = block_of(L_pad)
    if L_pad != L:
        u = jnp.pad(u.reshape(S, Ew, L), ((0, 0), (0, 0), (0, L_pad - L))
                    ).reshape(S, Ew * L_pad)
        v = jnp.pad(v.reshape(S, Ew, L), ((0, 0), (0, 0), (0, L_pad - L))
                    ).reshape(S, Ew * L_pad)
    ewp = Ew + ((-Ew) % E_b)
    if ewp != Ew:
        win = jnp.concatenate(
            [win, jnp.zeros((ewp - Ew, Hw, Ww), win.dtype)])
        padn = (ewp - Ew) * L_pad
        u = jnp.concatenate([u, jnp.zeros((S, padn), u.dtype)], axis=1)
        v = jnp.concatenate([v, jnp.zeros((S, padn), v.dtype)], axis=1)
    np_ = ewp * L_pad
    kernel = _make_k2(S, L_pad, E_b, Hw, Ww, with_grad)
    lane_spec = pl.BlockSpec((S, E_b * L_pad), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((E_b, Hw, Ww), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    n_out = 3 if with_grad else 1
    flops_mm = 2 if with_grad else 1
    out = pl.pallas_call(
        kernel,
        grid=(ewp // E_b,),
        in_specs=[lane_spec, lane_spec, win_spec],
        out_specs=tuple([lane_spec] * n_out),
        out_shape=tuple([jax.ShapeDtypeStruct((S, np_), jnp.float32)] * n_out),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=np_ * S * (flops_mm * 2 * Hw * Ww + 4 * (Hw + Ww)),
            bytes_accessed=(ewp * Hw * Ww + np_ * S * (2 + n_out)) * 4,
            transcendentals=0),
    )(u, v, win)

    def unpad(o):
        if L_pad == L:
            return o[:, :N]
        return o[:, :Ew * L_pad].reshape(S, Ew, L_pad)[:, :, :L].reshape(S, N)

    if with_grad:
        return unpad(out[0]), unpad(out[1]), unpad(out[2])
    return unpad(out[0])


# ---------------------------------------------------------------------------
# XLA glue + custom_vmap collapse
# ---------------------------------------------------------------------------

_FAR = 1e4   # out-of-map distance (esdf.py:66)


def _window_coords(px, py, worg, L, Hw, Ww):
    """World sample positions (S, N) -> clamped window cell-center coords,
    interior masks (the derivative of the clamp — autodiff through
    mapping/esdf.sample_bilinear's clip does the same masking), and the
    out-of-MAP mask (beyond the full grid the reference reads FAR/free)."""
    org = jnp.repeat(worg, L, axis=0)                        # (N, 7)
    res = org[:, 2][None, :]
    uraw = (py - org[:, 1][None, :]) / res - 0.5
    vraw = (px - org[:, 0][None, :]) / res - 0.5
    u = jnp.clip(uraw, 0.0, Hw - 1.001)
    v = jnp.clip(vraw, 0.0, Ww - 1.001)
    iny = (uraw > 0.0) & (uraw < Hw - 1.001)
    inx = (vraw > 0.0) & (vraw < Ww - 1.001)
    out_map = ((px < org[:, 3][None, :]) | (py < org[:, 4][None, :])
               | (px >= org[:, 5][None, :]) | (py >= org[:, 6][None, :]))
    return u, v, iny, inx, out_map, res


def _fwd_flat_impl(x, head, tail, win, worg, statics, interpret):
    M, K = statics[0], statics[2]
    safe_dis, w_c = statics[6], statics[10]
    N = x.shape[0]
    Ew, Hw, Ww = win.shape
    assert N % Ew == 0, (
        "grid-kernel batching requires env-major lane nesting "
        f"(N={N}, windows={Ew})")
    L = N // Ew
    fnc, px, py, wall = _k1_call(x, head, tail, statics, interpret)
    u, v, _, _, out_map, _ = _window_coords(px, py, worg, L, Hw, Ww)
    dis = jnp.where(out_map, _FAR, _k2_call(u, v, win, L, False, interpret))
    hc = jnp.maximum(safe_dis - dis, 0.0)
    return fnc + w_c * jnp.sum(wall * hc * hc * hc, axis=0)


def _valgrad_flat_impl(x, head, tail, win, worg, statics, interpret):
    M, K = statics[0], statics[2]
    safe_dis, w_c = statics[6], statics[10]
    N = x.shape[0]
    Ew, Hw, Ww = win.shape
    assert N % Ew == 0, (N, Ew)
    L = N // Ew
    _, px, py, wall = _k1_call(x, head, tail, statics, interpret)
    u, v, iny, inx, out_map, res = _window_coords(px, py, worg, L, Hw, Ww)
    dis, ddu, ddv = _k2_call(u, v, win, L, True, interpret)
    dis = jnp.where(out_map, _FAR, dis)
    hc = jnp.maximum(safe_dis - dis, 0.0)
    hc2 = hc * hc
    gs = w_c * wall * 3.0 * hc2
    gx = jnp.where(inx, ddv, 0.0) / res
    gy = jnp.where(iny, ddu, 0.0) / res
    collw = w_c * jnp.sum(wall * hc * hc2, axis=0)
    return _k3_call(x, head, tail, collw, -gs * gx, -gs * gy,
                    w_c * hc * hc2, statics, interpret)


def _collapse_rule_grid(fn):
    """custom_vmap collapse: per-lane args (x/head/tail/skip/...) flatten per
    lane (broadcasting when unbatched); win/worg — positions 3 and 4 —
    flatten only when batched: they stay per-env, and the kernel derives
    lanes-per-env = N_x // N_win."""
    def rule(axis_size, in_batched, *args):
        def flat(a, b):
            if not b:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            return a.reshape((-1,) + a.shape[2:])
        calls = []
        for i, (a, b) in enumerate(zip(args, in_batched)):
            if i in (3, 4):   # win, worg: per-env
                calls.append(a.reshape((-1,) + a.shape[2:]) if b else a)
            else:
                calls.append(flat(a, b))
        out = fn(*calls)
        if isinstance(out, tuple):
            return tuple(o.reshape((axis_size, -1) + o.shape[1:])
                         for o in out), (True,) * len(out)
        return out.reshape(axis_size, -1), True
    return rule


@functools.lru_cache(maxsize=None)
def _flat_fwd(statics, interpret):
    @jax.custom_batching.custom_vmap
    def fwd_flat(x, head, tail, win, worg):
        return _fwd_flat_impl(x, head, tail, win, worg, statics, interpret)

    fwd_flat.def_vmap(_collapse_rule_grid(fwd_flat))
    return fwd_flat


@functools.lru_cache(maxsize=None)
def _flat_valgrad(statics, interpret):
    @jax.custom_batching.custom_vmap
    def vg_flat(x, head, tail, win, worg):
        return _valgrad_flat_impl(x, head, tail, win, worg, statics,
                                  interpret)

    vg_flat.def_vmap(_collapse_rule_grid(vg_flat))
    return vg_flat


# ---------------------------------------------------------------------------
# public API (single-problem signature, vmappable env ⊃ lane ⊃ candidate)
# ---------------------------------------------------------------------------

def objective_fwd_grid(x: jnp.ndarray, head_state: jnp.ndarray,
                       tail_state: jnp.ndarray, win_esdf: jnp.ndarray,
                       win_origin: jnp.ndarray, pp: PlannerParams,
                       interpret: bool = False) -> jnp.ndarray:
    """Forward-only fused objective on an ESDF window (line-search values).

    win_esdf (Hw, Ww): distance-field crop from mapping/esdf.make_window;
    win_origin (7,): [x0, y0, res, map_x0, map_y0, map_x1, map_y1] — the
    crop origin/resolution plus full-map bounds for out-of-window clamping
    (the second vector make_window returns)."""
    assert pp.sampling == "relative", "kernel implements relative sampling"
    fn = _flat_fwd(_static(pp), interpret)
    return fn(x[None], head_state[None], tail_state[None], win_esdf[None],
              win_origin[None])[0]


def objective_valgrad_grid(x: jnp.ndarray, head_state: jnp.ndarray,
                           tail_state: jnp.ndarray, win_esdf: jnp.ndarray,
                           win_origin: jnp.ndarray, pp: PlannerParams,
                           interpret: bool = False):
    """(value, gradient) via the fused K1→K2(grad)→K3 chain."""
    assert pp.sampling == "relative", "kernel implements relative sampling"
    fn = _flat_valgrad(_static(pp), interpret)
    f, g = fn(x[None], head_state[None], tail_state[None], win_esdf[None],
              win_origin[None])
    return f[0], g[0]


@functools.lru_cache(maxsize=None)
def _vjp_objective_grid(statics, interpret):
    @jax.custom_vjp
    def obj(x, head, tail, win, worg):
        fn = _flat_fwd(statics, interpret)
        return fn(x[None], head[None], tail[None], win[None], worg[None])[0]

    def fwd(x, head, tail, win, worg):
        fn = _flat_valgrad(statics, interpret)
        f, g = fn(x[None], head[None], tail[None], win[None], worg[None])
        return f[0], (g[0], head, tail, win, worg)

    def bwd(res, ct):
        g, head, tail, win, worg = res
        return (g * ct, jnp.zeros_like(head), jnp.zeros_like(tail),
                jnp.zeros_like(win), jnp.zeros_like(worg))

    obj.defvjp(fwd, bwd)

    def obj_x_only(x, head, tail, win, worg):
        # d/dx only by contract (the adjoint kernel produces no boundary/map
        # cotangents) — stop upstream gradients explicitly
        return obj(x, jax.lax.stop_gradient(head), jax.lax.stop_gradient(tail),
                   jax.lax.stop_gradient(win), jax.lax.stop_gradient(worg))

    return obj_x_only


def objective_vjp_grid(x: jnp.ndarray, head_state: jnp.ndarray,
                       tail_state: jnp.ndarray, win_esdf: jnp.ndarray,
                       win_origin: jnp.ndarray, pp: PlannerParams,
                       interpret: bool = False) -> jnp.ndarray:
    """Kernel-backed grid objective differentiable w.r.t. x (only): value from
    the forward chain, gradient from the fused adjoint chain — the form the
    L-BFGS loop's value_and_grad consumes."""
    assert pp.sampling == "relative", "kernel implements relative sampling"
    return _vjp_objective_grid(_static(pp), interpret)(
        x, head_state, tail_state, win_esdf, win_origin)
