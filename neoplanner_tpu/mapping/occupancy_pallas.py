"""Scatter-free depth fusion: dense polar window update as a Pallas kernel.

The 2-D polar fusion (occupancy.insert_depth_2d) still scatters
carve_samples x W cells per frame; TPU scatters serialize, making fusion
~43 ms per 512-env frame (round-3 profile) — the dominant vision-loop stage
at sensor-rate cadence. This kernel inverts the update: instead of walking
rays and scattering, every cell of a max_range-sized window around the
camera computes its own polar coordinates (range, image column) and tests
itself against the per-column tables from occupancy.polar_columns:

    carve:  r_cell < r_carve(u_cell) - res        -> + l_miss
    hit:    |r_cell - r_hit(u_cell)| <= res/2     -> + l_hit

The per-cell column lookup is a `take_along_axis` on the (W,) tables, which
Mosaic lowers to `tpu.dynamic_gather` — no scatters, no one-hot weights, no
HBM temporaries. Differences vs the scatter form, both benign: the carve
marks *every* cell inside the carve radius (the 48-sample scatter ray skips
cells beyond 4.8 m — the dense form is strictly more faithful to
octomap_server's per-cell traversal), and a hit may mark the 1-2 cells whose
centers fall within half a cell of the surface rather than exactly one
(polar rasterization vs point scatter). tests/test_sense.py pins IoU between
the two forms.

The column index comes from the camera-frame tangent (no trig):
ray_dirs_camera maps column u to body azimuth tan(beta) = -(u+0.5-W/2)/fx,
so a cell at camera-frame offset (dcx, dcy) lands at
u = W/2 - 0.5 - fx * dcy/dcx. Azimuths use the camera-forward yaw (the
mid-row azimuth the scatter form uses — exact for level flight).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neoplanner_tpu.config import CameraParams, MapParams
from neoplanner_tpu.core import frames
from neoplanner_tpu.mapping import occupancy

_E_B = 8   # envs per program


def _make_kernel(E_b, ch, cw, Wt, Wcam, fx, res, l_hit, l_miss, l_min,
                 l_max):
    qw = max(cw, 128)          # gather shape: one 128-lane vreg per row
    n_chunks = Wt // 128

    def kernel(win_ref, tabs_ref, sc_ref, out_ref):
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (ch, qw),
                                          0).astype(jnp.float32)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (ch, qw), 1)
        iota_cf = iota_c.astype(jnp.float32)
        for e in range(E_b):
            ox = sc_ref[e, 0]
            oy = sc_ref[e, 1]
            px = sc_ref[e, 2]
            py = sc_ref[e, 3]
            cp = sc_ref[e, 4]
            sp = sc_ref[e, 5]
            dx = ox + iota_cf * res - px             # (ch, qw)
            dy = oy + iota_r * res - py
            dcx = cp * dx + sp * dy                  # camera-frame forward
            dcy = -sp * dx + cp * dy                 # camera-frame left
            r_cell = jnp.sqrt(dx * dx + dy * dy)
            u = Wcam / 2.0 - 0.5 - fx * dcy / jnp.maximum(dcx, 1e-6)
            uidx = jnp.round(u).astype(jnp.int32)
            valid = (dcx > 1e-6) & (uidx >= 0) & (uidx <= Wcam - 1) \
                & (iota_c < cw)
            uq = jnp.clip(uidx, 0, Wt - 1)
            tab = tabs_ref[e]           # (2 * n_chunks, 128): rows =
            #                             [hit chunks..., carve chunks...]
            # tpu.dynamic_gather reads within a single 128-lane vreg: look
            # the polar tables up 128 columns at a time and select by range
            rhit = jnp.zeros((ch, qw), jnp.float32)
            rcarve = jnp.zeros((ch, qw), jnp.float32)
            for c in range(n_chunks):
                src_h = jnp.broadcast_to(
                    jax.lax.slice(tab, (c, 0), (c + 1, 128)), (ch, 128))
                src_c = jnp.broadcast_to(
                    jax.lax.slice(tab, (n_chunks + c, 0),
                                  (n_chunks + c + 1, 128)), (ch, 128))
                idx_c = jnp.clip(uq - c * 128, 0, 127)
                if qw > 128:
                    idx_c = jax.lax.slice(idx_c, (0, 0), (ch, 128))
                g_h = jnp.take_along_axis(src_h, idx_c, axis=1)
                g_c = jnp.take_along_axis(src_c, idx_c, axis=1)
                if qw > 128:
                    pad = jnp.zeros((ch, qw - 128), jnp.float32)
                    g_h = jnp.concatenate([g_h, pad], axis=1)
                    g_c = jnp.concatenate([g_c, pad], axis=1)
                sel = (uq >= c * 128) & (uq < (c + 1) * 128)
                rhit = jnp.where(sel, g_h, rhit)
                rcarve = jnp.where(sel, g_c, rcarve)
            upd = jnp.where(
                valid & (r_cell > 0.0) & (r_cell < rcarve - res),
                l_miss, 0.0)
            upd = upd + jnp.where(
                valid & (rhit < occupancy.BIG)
                & (jnp.abs(r_cell - rhit) <= 0.5 * res), l_hit, 0.0)
            upd_cw = (upd if cw == qw
                      else jax.lax.slice(upd, (0, 0), (ch, cw)))
            out_ref[e] = jnp.clip(win_ref[e] + upd_cw, l_min, l_max)

    return kernel


@functools.lru_cache(maxsize=None)
def _fuse_call(E_b, ch, cw, Wt, Wcam, fx, res, l_hit, l_miss, l_min, l_max,
               interpret):
    kernel = _make_kernel(E_b, ch, cw, Wt, Wcam, fx, res, l_hit, l_miss,
                          l_min, l_max)

    def call(wins, tabs, sc):
        E = wins.shape[0]
        n_rows = 2 * (Wt // 128)
        # chunk the (2, Wt) polar tables onto sublanes: (2*n_chunks, 128)
        tabs = tabs.reshape(E, n_rows, 128)
        ep = E + ((-E) % E_b)
        if ep != E:
            wins = jnp.concatenate(
                [wins, jnp.zeros((ep - E, ch, cw), wins.dtype)])
            tabs = jnp.concatenate(
                [tabs, jnp.zeros((ep - E, n_rows, 128), tabs.dtype)])
            sc = jnp.concatenate([sc, jnp.zeros((ep - E, 8), sc.dtype)])
        out = pl.pallas_call(
            kernel,
            grid=(ep // E_b,),
            in_specs=[
                pl.BlockSpec((E_b, ch, cw), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_b, n_rows, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_b, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((E_b, ch, cw), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ep, ch, cw), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=ep * ch * Wt * 25,
                bytes_accessed=ep * (2 * ch * cw + 2 * Wt + 8) * 4,
                transcendentals=ep * ch * Wt),
        )(wins.astype(jnp.float32), tabs.astype(jnp.float32),
          sc.astype(jnp.float32))
        return out[:E]

    return call


_WH = 136  # v2 row window: 128-cell range cap + 8 rows of alignment slack


def _make_kernel_v2(E_b, H, W, WH, Wt, Wcam, fx, res, l_hit, l_miss, l_min,
                    l_max):
    """Whole-grid fusion kernel: no host-side window slice/write-back.

    The v1 path extracted a (128, 128) window with a vmapped dynamic_slice /
    dynamic_update_slice pair — XLA lowers the per-env offsets to a
    gather/scatter over the batch that cost ~36 ms per frame at B=4096
    (examples/probe_fusion.py), 4x the update kernel itself. Here each
    program holds E_b whole (H, W) log-odds grids in VMEM (192 KB each),
    copies them to the output block, and updates a WH-row window in place:
    rows are sliced *inside* the kernel at an 8-aligned dynamic offset
    (provably aligned: the SMEM scalar is the row-block index, multiplied by
    8 in-kernel — Mosaic rule 14), columns are processed in static 128-lane
    halves over the full width (cells beyond sensor range self-mask via the
    r_cell < r_carve / |r_cell - r_hit| tests, so the old +-64-column crop
    was an optimization, not semantics). HBM traffic is the grid in + out
    (aliased), ~2 KB-per-cell-free vs the v1 slice chain."""
    n_chunks = Wt // 128
    n_halves = W // 128
    dyn_rows = H > WH
    wh = WH if dyn_rows else H

    def kernel(r8_ref, win_ref, tabs_ref, sc_ref, out_ref):
        iota_r0 = jax.lax.broadcasted_iota(jnp.int32, (wh, 128),
                                           0).astype(jnp.float32)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (wh, 128),
                                          1).astype(jnp.float32)
        for e in range(E_b):
            out_ref[e] = win_ref[e]
            if dyn_rows:
                r0 = r8_ref[e, 0] * 8
                rows = pl.ds(r0, WH)
                iota_r = iota_r0 + r0.astype(jnp.float32)
            else:
                rows = slice(None)
                iota_r = iota_r0
            px = sc_ref[e, 2]
            py = sc_ref[e, 3]
            cp = sc_ref[e, 4]
            sp = sc_ref[e, 5]
            for h in range(n_halves):
                colf = iota_l + float(h * 128)
                dx = sc_ref[e, 0] + colf * res - px       # sc[0] = x of col 0
                dy = sc_ref[e, 1] + iota_r * res - py     # sc[1] = y of row 0
                dcx = cp * dx + sp * dy
                dcy = -sp * dx + cp * dy
                r_cell = jnp.sqrt(dx * dx + dy * dy)
                u = Wcam / 2.0 - 0.5 - fx * dcy / jnp.maximum(dcx, 1e-6)
                uidx = jnp.floor(u + 0.5).astype(jnp.int32)  # round: rule 14
                valid = (dcx > 1e-6) & (uidx >= 0) & (uidx <= Wcam - 1)
                uq = jnp.clip(uidx, 0, Wt - 1)
                rhit = jnp.zeros((wh, 128), jnp.float32)
                rcarve = jnp.zeros((wh, 128), jnp.float32)
                for c in range(n_chunks):
                    src_h = jnp.broadcast_to(
                        tabs_ref[e, c][None, :], (wh, 128))
                    src_c = jnp.broadcast_to(
                        tabs_ref[e, n_chunks + c][None, :], (wh, 128))
                    idx_c = jnp.clip(uq - c * 128, 0, 127)
                    g_h = jnp.take_along_axis(src_h, idx_c, axis=1)
                    g_c = jnp.take_along_axis(src_c, idx_c, axis=1)
                    sel = (uq >= c * 128) & (uq < (c + 1) * 128)
                    rhit = jnp.where(sel, g_h, rhit)
                    rcarve = jnp.where(sel, g_c, rcarve)
                upd = jnp.where(
                    valid & (r_cell > 0.0) & (r_cell < rcarve - res),
                    l_miss, 0.0)
                upd = upd + jnp.where(
                    valid & (rhit < occupancy.BIG)
                    & (jnp.abs(r_cell - rhit) <= 0.5 * res), l_hit, 0.0)
                cols = pl.ds(h * 128, 128)
                out_ref[e, rows, cols] = jnp.clip(
                    out_ref[e, rows, cols] + upd, l_min, l_max)

    return kernel


@functools.lru_cache(maxsize=None)
def _fuse_call_v2(E_b, H, W, WH, Wt, Wcam, fx, res, l_hit, l_miss, l_min,
                  l_max, interpret):
    kernel = _make_kernel_v2(E_b, H, W, WH, Wt, Wcam, fx, res, l_hit, l_miss,
                             l_min, l_max)

    def call(logodds, tabs, sc, r8):
        E = logodds.shape[0]
        n_rows = 2 * (Wt // 128)
        tabs = tabs.reshape(E, n_rows, 128)
        ep = E + ((-E) % E_b)
        if ep != E:
            logodds = jnp.concatenate(
                [logodds, jnp.zeros((ep - E, H, W), logodds.dtype)])
            tabs = jnp.concatenate(
                [tabs, jnp.zeros((ep - E, n_rows, 128), tabs.dtype)])
            sc = jnp.concatenate([sc, jnp.zeros((ep - E, 8), sc.dtype)])
            r8 = jnp.concatenate([r8, jnp.zeros((ep - E,), r8.dtype)])
        out = pl.pallas_call(
            kernel,
            grid=(ep // E_b,),
            in_specs=[
                # rank-1 SMEM blocks must cover the array or tile by 128;
                # a (E_b, 1) rank-2 block sidesteps that Mosaic rule
                pl.BlockSpec((E_b, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((E_b, H, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_b, n_rows, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_b, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((E_b, H, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ep, H, W), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=ep * min(WH, H) * W * 25,
                bytes_accessed=ep * (2 * H * W + 2 * Wt + 8) * 4,
                transcendentals=ep * min(WH, H) * W),
        )(r8.astype(jnp.int32)[:, None], logodds.astype(jnp.float32),
          tabs.astype(jnp.float32), sc.astype(jnp.float32))
        return out[:E]

    return call


def _window_cells(cam: CameraParams, mp: MapParams):
    # the per-row gather works on one 128-lane vreg, so the update window is
    # capped at 128 cells (12.8 m at 0.1 m); window_fits() gates the dense
    # backend on that cap so over-range configs fall back to the scatter form
    # instead of silently dropping far hits/carves
    c = 2 * int(math.ceil(cam.max_range / mp.resolution)) + 8
    return min(c, mp.height, 128), min(c, mp.width, 128)


def window_fits(cam: CameraParams, mp: MapParams) -> bool:
    """True iff the dense-fusion window covers the full sensor range: cells
    beyond the 128-cell vreg cap (or the map edge-clamped window) would be
    silently un-updated, diverging from the '2d' scatter backend."""
    c = 2 * int(math.ceil(cam.max_range / mp.resolution)) + 8
    # a map no larger than the vreg cap is fully covered by the window even
    # when c > 128, so nothing can be dropped in that case either
    return c <= 128 or (mp.height <= 128 and mp.width <= 128)


def insert_depth_2d_dense(logodds: jnp.ndarray, depth: jnp.ndarray,
                          pos: jnp.ndarray, quat: jnp.ndarray,
                          cam: CameraParams, mp: MapParams,
                          row_stride: int = 1,
                          interpret: bool = False) -> jnp.ndarray:
    """Kernel-fused projected-plane depth fusion; single-env signature,
    vmappable over envs (the kernel batches through custom_vmap collapse)."""
    if not window_fits(cam, mp):
        raise ValueError(
            f"dense fusion window (128-cell cap) does not cover "
            f"cam.max_range={cam.max_range} at resolution={mp.resolution}; "
            f"use occupancy.insert_depth_2d (fusion='2d') for this config")
    return _flat_fuse(cam, mp, row_stride, interpret)(
        logodds[None], depth[None], pos[None], quat[None])[0]


def _fuse_flat(logodds, depth, pos, quat, cam: CameraParams, mp: MapParams,
               row_stride: int, interpret: bool):
    E, H, W = logodds.shape
    Wt = -(-cam.width // 128) * 128    # table padded to whole 128-lane vregs

    r_hit, r_carve, _ = jax.vmap(
        lambda d, p, q: occupancy.polar_columns(d, p, q, cam, mp, row_stride)
    )(depth, pos, quat)
    tabs = jnp.stack([r_hit, r_carve], axis=1)             # (E, 2, Wcam)
    if Wt > cam.width:
        tabs = jnp.pad(tabs, ((0, 0), (0, 0), (0, Wt - cam.width)),
                       constant_values=occupancy.BIG)

    fwd = jax.vmap(lambda q: frames.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
                   )(quat)
    psi = jnp.arctan2(fwd[:, 1], fwd[:, 0])

    if W % 128 == 0 and H % 8 == 0:
        # v2: whole-grid blocks, in-kernel 8-aligned row window — no host
        # dynamic_slice / dynamic_update_slice pair (the vmapped per-env
        # offsets cost ~36 ms/frame at B=4096, 4x the update kernel)
        row_d = (pos[:, 1] - mp.origin_y) / mp.resolution
        r0 = jnp.clip(jnp.round(row_d - _WH / 2), 0,
                      max(H - _WH, 0)).astype(jnp.int32)
        r8 = r0 // 8
        ox = jnp.full((E,), mp.origin_x + 0.5 * mp.resolution)
        oy = jnp.full((E,), mp.origin_y + 0.5 * mp.resolution)
        sc = jnp.stack([ox, oy, pos[:, 0], pos[:, 1], jnp.cos(psi),
                        jnp.sin(psi), jnp.zeros_like(psi),
                        jnp.zeros_like(psi)], axis=1)
        call = _fuse_call_v2(_E_B, H, W, _WH, Wt, cam.width, cam.fx,
                             mp.resolution, occupancy._l(mp.prob_hit),
                             occupancy._l(mp.prob_miss),
                             occupancy._l(mp.clamp_min),
                             occupancy._l(mp.clamp_max), interpret)
        return call(logodds, tabs, sc, r8)

    # v1 fallback (irregular map shapes): host-side window slice + kernel
    ch, cw = _window_cells(cam, mp)
    row_d = (pos[:, 1] - mp.origin_y) / mp.resolution
    col_d = (pos[:, 0] - mp.origin_x) / mp.resolution
    r0 = jnp.clip(jnp.round(row_d - ch / 2), 0, H - ch).astype(jnp.int32)
    c0 = jnp.clip(jnp.round(col_d - cw / 2), 0, W - cw).astype(jnp.int32)
    wins = jax.vmap(lambda lo, r, c: jax.lax.dynamic_slice(
        lo, (r, c), (ch, cw)))(logodds, r0, c0)

    # window origin = world coords of its cell (0, 0) center
    ox = mp.origin_x + (c0.astype(jnp.float32) + 0.5) * mp.resolution
    oy = mp.origin_y + (r0.astype(jnp.float32) + 0.5) * mp.resolution
    sc = jnp.stack([ox, oy, pos[:, 0], pos[:, 1], jnp.cos(psi),
                    jnp.sin(psi), jnp.zeros_like(psi), jnp.zeros_like(psi)],
                   axis=1)

    call = _fuse_call(_E_B, ch, cw, Wt, cam.width, cam.fx, mp.resolution,
                      occupancy._l(mp.prob_hit), occupancy._l(mp.prob_miss),
                      occupancy._l(mp.clamp_min), occupancy._l(mp.clamp_max),
                      interpret)
    new_wins = call(wins, tabs, sc)
    return jax.vmap(lambda lo, wn, r, c: jax.lax.dynamic_update_slice(
        lo, wn, (r, c)))(logodds, new_wins, r0, c0)


@functools.lru_cache(maxsize=None)
def _flat_fuse(cam: CameraParams, mp: MapParams, row_stride: int,
               interpret: bool):
    @jax.custom_batching.custom_vmap
    def fuse_flat(logodds, depth, pos, quat):
        return _fuse_flat(logodds, depth, pos, quat, cam, mp, row_stride,
                          interpret)

    def rule(axis_size, in_batched, *args):
        flat = []
        for a, b in zip(args, in_batched):
            if not b:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            flat.append(a.reshape((-1,) + a.shape[2:]))
        out = fuse_flat(*flat)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    fuse_flat.def_vmap(rule)
    return fuse_flat
