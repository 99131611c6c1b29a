"""Scatter-free depth fusion: dense polar window update as a Pallas kernel.

The 2-D polar fusion (occupancy.insert_depth_2d) still scatters
carve_samples x W cells per frame; TPU scatters serialize, making fusion
~43 ms per 512-env frame (round-3 profile) — the dominant vision-loop stage
at sensor-rate cadence. This kernel inverts the CARVE: instead of walking
rays and scattering, every cell of a reach-sized window around the camera
computes its own polar coordinates (range, image column) and tests itself
against the per-column carve table from occupancy.polar_columns:

    carve:  r_cell < r_carve(u_cell) - res        -> + l_miss

The per-cell column lookup is a `take_along_axis` on the (W,) table, which
Mosaic lowers to `tpu.dynamic_gather` — no scatters, no one-hot weights, no
HBM temporaries. HITS stay a scatter (outside the kernel, identical math to
occupancy.insert_depth_2d): there are only W of them per frame (~2% of the
carve volume that motivated this kernel), and scattering marks *exactly*
the cell containing each column's hit point — a per-cell range-band test
cannot (a cell center can sit res/sqrt(2) > res/2 off the hit circle at
oblique azimuths, silently skipping the surface cell; advisor round 4 /
test_dense_fusion_far_corner_coverage). The one remaining difference vs the
scatter form is benign and strictly more faithful to octomap_server's
per-cell ray traversal: the dense carve marks *every* cell inside the carve
radius, where the 48-sample scatter ray skips cells beyond 4.8 m.
tests/test_sense.py pins hit-set equality and carve IoU between the forms.

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


def _make_kernel(E_b, ch, cw, Wt, Wcam, fx, res, l_miss, l_min, l_max):
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
            tab = tabs_ref[e]           # (n_chunks, 128) carve chunks
            # tpu.dynamic_gather reads within a single 128-lane vreg: look
            # the carve table up 128 columns at a time and select by range
            rcarve = jnp.zeros((ch, qw), jnp.float32)
            for c in range(n_chunks):
                src_c = jnp.broadcast_to(
                    jax.lax.slice(tab, (c, 0), (c + 1, 128)), (ch, 128))
                idx_c = jnp.clip(uq - c * 128, 0, 127)
                if qw > 128:
                    idx_c = jax.lax.slice(idx_c, (0, 0), (ch, 128))
                g_c = jnp.take_along_axis(src_c, idx_c, axis=1)
                if qw > 128:
                    pad = jnp.zeros((ch, qw - 128), jnp.float32)
                    g_c = jnp.concatenate([g_c, pad], axis=1)
                sel = (uq >= c * 128) & (uq < (c + 1) * 128)
                rcarve = jnp.where(sel, g_c, rcarve)
            upd = jnp.where(
                valid & (r_cell > 0.0) & (r_cell < rcarve - res),
                l_miss, 0.0)
            upd_cw = (upd if cw == qw
                      else jax.lax.slice(upd, (0, 0), (ch, cw)))
            out_ref[e] = jnp.clip(win_ref[e] + upd_cw, l_min, l_max)

    return kernel


@functools.lru_cache(maxsize=None)
def _fuse_call(E_b, ch, cw, Wt, Wcam, fx, res, l_miss, l_min, l_max,
               interpret):
    kernel = _make_kernel(E_b, ch, cw, Wt, Wcam, fx, res, l_miss,
                          l_min, l_max)

    def call(wins, tabs, sc):
        E = wins.shape[0]
        n_rows = Wt // 128
        # chunk the (Wt,) carve table onto sublanes: (n_chunks, 128)
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


_WH = None  # test override for the v2 row window; None = derive from camera


def _reach_cells(cam: CameraParams, mp: MapParams) -> int:
    """Worst-case horizontal reach of any pixel's projected update, in cells.

    depth is a z-depth: a corner ray at z-depth max_range travels a
    horizontal range of max_range*sqrt(1+tan^2(beta_max)) (~8.2 m for the
    86-deg camera, NOT max_range) — polar_columns does not clamp r_hit /
    r_carve to max_range, matching the scatter form and octomap's full-ray
    insertion. The in-kernel carve reaches r_carve - res <= this; hits are
    scattered outside the kernel and never clipped by the window."""
    tanb = (cam.width / 2.0) / cam.fx
    r = cam.max_range * math.sqrt(1.0 + tanb * tanb)
    return int(math.ceil(r / mp.resolution + 0.5))


def _row_window_cells(cam: CameraParams, mp: MapParams) -> int:
    """v2/v3 row-window height: covers +-reach around the camera row through
    the worst case of round() (+-0.5), the in-kernel floor-to-8 (-7) and the
    floor() in the hit cell index (-1, the v3 in-kernel hits), with the
    window center biased +4 rows to split the floor slack. Exact worst-case
    requirement: WH >= 2*reach_m/res + 11; 2*_reach_cells + 10 dominates it
    (_reach_cells already carries a +0.5 ceil)."""
    if _WH is not None:
        return _WH
    return -(-(2 * _reach_cells(cam, mp) + 10) // 8) * 8


def _make_kernel_v2(E_b, H, W, WH, Wt, Wcam, fx, res, l_miss, l_min,
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
    r_cell < r_carve test, so the old +-64-column crop was an optimization,
    not semantics). HBM traffic is the grid in + out (aliased), ~2
    KB-per-cell-free vs the v1 slice chain."""
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
                rcarve = jnp.zeros((wh, 128), jnp.float32)
                for c in range(n_chunks):
                    src_c = jnp.broadcast_to(
                        tabs_ref[e, c][None, :], (wh, 128))
                    idx_c = jnp.clip(uq - c * 128, 0, 127)
                    g_c = jnp.take_along_axis(src_c, idx_c, axis=1)
                    sel = (uq >= c * 128) & (uq < (c + 1) * 128)
                    rcarve = jnp.where(sel, g_c, rcarve)
                upd = jnp.where(
                    valid & (r_cell > 0.0) & (r_cell < rcarve - res),
                    l_miss, 0.0)
                cols = pl.ds(h * 128, 128)
                out_ref[e, rows, cols] = jnp.clip(
                    out_ref[e, rows, cols] + upd, l_min, l_max)

    return kernel


@functools.lru_cache(maxsize=None)
def _fuse_call_v2(E_b, H, W, WH, Wt, Wcam, fx, res, l_miss, l_min,
                  l_max, interpret):
    kernel = _make_kernel_v2(E_b, H, W, WH, Wt, Wcam, fx, res, l_miss,
                             l_min, l_max)

    def call(logodds, tabs, sc, r8):
        E = logodds.shape[0]
        n_rows = Wt // 128
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
            # the grid updates in place when the caller's buffer is dead
            # (the kernel copies win_ref to out_ref before updating, so the
            # alias is safe)
            input_output_aliases={1: 0},
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


def _make_kernel_v3(E_b, F, H, W, WH, Wt, Wcam, fx, res, l_hit, l_miss,
                    l_min, l_max):
    """Multi-frame fusion kernel: F frames' carves AND hits in ONE program.

    Sensor-rate fusion (fuse_frames=6, step_segment) applied the v2 kernel +
    an XLA hit scatter once per mid-segment frame — the (H, W) log-odds grid
    crossed HBM in and out F times per segment, and TPU scatters serialize
    per duplicate index. Mid-segment fusion has no consumer between frames
    (tracking follows the precomputed command buffer; the ESDF is rebuilt
    once per segment at esdf_rate=1), so the grid can stay in VMEM across
    all F updates: per env, copy once, then per frame add carve + hit and
    clip — exactly insert_depth_2d's per-frame semantics (one clip per
    frame over the summed update).

    Hits ride the MXU instead of a scatter: per frame, the hit count of cell
    (i, j) is sum_u [hrow_u == r0+i][hcol_u == j] — a (WH, Wt) x (Wt, W)
    product of 0/1 one-hots (exact in bf16; counts <= Wcam accumulate
    exactly in the f32 matmul accumulator). The row factor builds from
    hrow in LANE layout against a sublane iota; the column factor builds
    from hcol passed pre-transposed in SUBLANE layout (E, F*Wt, 1) against a
    lane iota — no in-kernel transpose (Mosaic has none). Invalid columns
    (no hit / out of map, masked in XLA) carry index -1 and never match.
    Hit points always land inside the camera-reach row window (_reach_cells
    covers r_hit by construction), so the windowed row factor drops
    nothing."""
    n_chunks = Wt // 128
    n_halves = W // 128
    dyn_rows = H > WH
    wh = WH if dyn_rows else H

    def kernel(r8_ref, win_ref, tabs_ref, hrow_ref, hcol_ref, sc_ref,
               out_ref):
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (wh, 128),
                                          1).astype(jnp.float32)
        iota_rh = jax.lax.broadcasted_iota(jnp.int32, (wh, 128),
                                           0).astype(jnp.float32)
        iota_rw = jax.lax.broadcasted_iota(jnp.int32, (wh, Wt),
                                           0).astype(jnp.float32)
        iota_cw = jax.lax.broadcasted_iota(jnp.int32, (Wt, W),
                                           1).astype(jnp.float32)
        for e in range(E_b):
            out_ref[e] = win_ref[e]
            for f in range(F):
                if dyn_rows:
                    r0 = r8_ref[e, f] * 8
                    rows = pl.ds(r0, WH)
                    r0f = r0.astype(jnp.float32)
                else:
                    rows = slice(None)
                    r0f = 0.0
                px = sc_ref[e, f, 2]
                py = sc_ref[e, f, 3]
                cp = sc_ref[e, f, 4]
                sp = sc_ref[e, f, 5]
                halves = []
                for h in range(n_halves):
                    colf = iota_l + float(h * 128)
                    dx = sc_ref[e, f, 0] + colf * res - px
                    dy = sc_ref[e, f, 1] + (iota_rh + r0f) * res - py
                    dcx = cp * dx + sp * dy
                    dcy = -sp * dx + cp * dy
                    r_cell = jnp.sqrt(dx * dx + dy * dy)
                    u = Wcam / 2.0 - 0.5 - fx * dcy / jnp.maximum(dcx, 1e-6)
                    uidx = jnp.floor(u + 0.5).astype(jnp.int32)
                    valid = (dcx > 1e-6) & (uidx >= 0) & (uidx <= Wcam - 1)
                    uq = jnp.clip(uidx, 0, Wt - 1)
                    rcarve = jnp.zeros((wh, 128), jnp.float32)
                    for c in range(n_chunks):
                        src_c = jnp.broadcast_to(
                            tabs_ref[e, f * n_chunks + c][None, :], (wh, 128))
                        idx_c = jnp.clip(uq - c * 128, 0, 127)
                        g_c = jnp.take_along_axis(src_c, idx_c, axis=1)
                        sel = (uq >= c * 128) & (uq < (c + 1) * 128)
                        rcarve = jnp.where(sel, g_c, rcarve)
                    halves.append(jnp.where(
                        valid & (r_cell > 0.0) & (r_cell < rcarve - res),
                        l_miss, 0.0))
                upd = jnp.concatenate(halves, axis=1)       # (wh, W) carve
                # hit one-hot factors (see docstring): R[i, u] = 1 iff frame
                # f's column-u hit row == window row r0 + i (rows from
                # lane-layout hrow against a sublane iota) ...
                hr = jnp.broadcast_to(hrow_ref[e, f][None, :], (wh, Wt))
                Rm = (hr == iota_rw + r0f).astype(jnp.bfloat16)
                # ... C[u, j] = 1 iff that hit column == j (hcol passed
                # pre-transposed in sublane layout against a lane iota)
                hc = hcol_ref[e, pl.ds(f * Wt, Wt)]         # (Wt, 1)
                Cm = (jnp.broadcast_to(hc, (Wt, W))
                      == iota_cw).astype(jnp.bfloat16)
                hits = jax.lax.dot_general(
                    Rm, Cm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (wh, W) counts
                out_ref[e, rows, :] = jnp.clip(
                    out_ref[e, rows, :] + upd + hits * l_hit, l_min, l_max)

    return kernel


@functools.lru_cache(maxsize=None)
def _fuse_call_v3(E_b, F, H, W, WH, Wt, Wcam, fx, res, l_hit, l_miss,
                  l_min, l_max, interpret):
    kernel = _make_kernel_v3(E_b, F, H, W, WH, Wt, Wcam, fx, res, l_hit,
                             l_miss, l_min, l_max)

    def call(logodds, tabs, hrow, hcol_t, sc, r8):
        E = logodds.shape[0]
        n_rows = F * (Wt // 128)
        tabs = tabs.reshape(E, n_rows, 128)
        ep = E + ((-E) % E_b)
        if ep != E:
            pad = ep - E
            logodds = jnp.concatenate(
                [logodds, jnp.zeros((pad, H, W), logodds.dtype)])
            tabs = jnp.concatenate(
                [tabs, jnp.zeros((pad, n_rows, 128), tabs.dtype)])
            hrow = jnp.concatenate(
                [hrow, jnp.full((pad, F, Wt), -1.0, hrow.dtype)])
            hcol_t = jnp.concatenate(
                [hcol_t, jnp.full((pad, F * Wt, 1), -1.0, hcol_t.dtype)])
            sc = jnp.concatenate([sc, jnp.zeros((pad, F, 8), sc.dtype)])
            r8 = jnp.concatenate([r8, jnp.zeros((pad, F), r8.dtype)])
        out = pl.pallas_call(
            kernel,
            grid=(ep // E_b,),
            in_specs=[
                pl.BlockSpec((E_b, F), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((E_b, H, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_b, n_rows, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_b, F, Wt), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_b, F * Wt, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_b, F, 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((E_b, H, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ep, H, W), jnp.float32),
            input_output_aliases={1: 0},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=ep * F * min(WH, H) * (W * 25 + 2 * Wt * W),
                bytes_accessed=ep * (2 * H * W + 4 * F * Wt + 8 * F) * 4,
                transcendentals=ep * F * min(WH, H) * W),
        )(r8.astype(jnp.int32), logodds.astype(jnp.float32),
          tabs.astype(jnp.float32), hrow.astype(jnp.float32),
          hcol_t.astype(jnp.float32), sc.astype(jnp.float32))
        return out[:E]

    return call


def _window_cells(cam: CameraParams, mp: MapParams):
    # v1 (irregular-map fallback) window: capped at 128 cells per axis;
    # window_fits() gates the dense backend on that cap so over-range
    # configs fall back to the scatter form instead of silently dropping
    # far hits/carves
    c = 2 * _reach_cells(cam, mp) + 2
    return min(c, mp.height, 128), min(c, mp.width, 128)


def window_fits(cam: CameraParams, mp: MapParams) -> bool:
    """True iff the dense-fusion path covers the full sensor reach.

    v2 (W%128==0 and H%8==0 maps) covers all columns and a camera-derived
    row window, so it always fits. v1's window is capped at 128 cells per
    axis, which the ~164-cell corner-ray reach of the standard camera
    exceeds — those configs must use the '2d' scatter backend unless the
    whole map fits inside the 128-cell window."""
    if mp.width % 128 == 0 and mp.height % 8 == 0:
        return True
    c = 2 * _reach_cells(cam, mp) + 2
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


def _scatter_hits(out, r_hit, u_dir, pos, mp: MapParams):
    """Mark each column's hit cell exactly as occupancy.insert_depth_2d does
    (the point scatter is the ground truth the dense carve kernel defers to:
    only W adds per frame, and a per-cell range-band test cannot guarantee
    covering the hit-point cell at oblique azimuths)."""
    E, H, W = out.shape
    l_hit = occupancy._l(mp.prob_hit)
    hx = pos[:, 0:1] + r_hit * u_dir[..., 0]               # (E, Wcam)
    hy = pos[:, 1:2] + r_hit * u_dir[..., 1]
    hrow, hcol, hinb = occupancy._cell_idx(hx, hy, mp)
    w_hit = (hinb & (r_hit < occupancy.BIG)).astype(out.dtype) * l_hit
    eidx = jnp.arange(E)[:, None]
    out = out.at[eidx, jnp.clip(hrow, 0, H - 1),
                 jnp.clip(hcol, 0, W - 1)].add(w_hit)
    return jnp.clip(out, occupancy._l(mp.clamp_min),
                    occupancy._l(mp.clamp_max))


def insert_depth_2d_dense_multi(logodds: jnp.ndarray, depths: jnp.ndarray,
                                pos: jnp.ndarray, quat: jnp.ndarray,
                                cam: CameraParams, mp: MapParams,
                                row_stride: int = 1,
                                interpret: bool = False) -> jnp.ndarray:
    """Fuse F depth frames (one segment's sensor-rate backlog) in ONE v3
    kernel invocation: the grid crosses HBM once instead of F times, carves
    and hits both apply in-kernel with insert_depth_2d's exact per-frame
    clip semantics (hits via in-kernel one-hot MXU matmuls — no scatter).
    Single-env signature — depths (F, h, w), pos (F, 3), quat (F, 4) —
    vmappable over envs. Requires a v2-eligible map (W % 128 == 0,
    H % 8 == 0); callers fall back to per-frame fuse_frame otherwise
    (sim/env.step_segment)."""
    if not (mp.width % 128 == 0 and mp.height % 8 == 0):
        raise ValueError("multi-frame dense fusion requires W % 128 == 0 "
                         "and H % 8 == 0 (the v3 whole-grid kernel)")
    return _flat_fuse_multi(cam, mp, row_stride, interpret)(
        logodds[None], depths[None], pos[None], quat[None])[0]


def _fuse_flat_multi(logodds, depths, pos, quat, cam: CameraParams,
                     mp: MapParams, row_stride: int, interpret: bool):
    E, H, W = logodds.shape
    F = depths.shape[1]
    Wt = -(-cam.width // 128) * 128

    # single flattened (E*F) vmap, not vmap(vmap(...)): any temp XLA does
    # materialize then has (rows, Wcam) minor dims — near-zero tile padding —
    # instead of carrying the F=5 dim into an 8-tile (2.6x waste at B=8192)
    EF = E * F
    r_hit, r_carve, u_dir = jax.vmap(
        lambda d, p, q: occupancy.polar_columns(d, p, q, cam, mp,
                                                row_stride))(
        depths.reshape((EF,) + depths.shape[2:]),
        pos.reshape(EF, 3), quat.reshape(EF, 4))
    r_hit = r_hit.reshape(E, F, -1)                        # (E, F, Wcam)
    r_carve = r_carve.reshape(E, F, -1)
    u_dir = u_dir.reshape(E, F, -1, 2)
    tabs = r_carve
    if Wt > cam.width:
        tabs = jnp.pad(tabs, ((0, 0), (0, 0), (0, Wt - cam.width)))

    fwd = jax.vmap(jax.vmap(
        lambda q: frames.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))))(quat)
    psi = jnp.arctan2(fwd[..., 1], fwd[..., 0])            # (E, F)

    # hit cells, precomputed in XLA; invalid columns (no hit / out of map)
    # carry index -1 so neither one-hot factor ever matches them
    hx = pos[..., 0:1] + r_hit * u_dir[..., 0]             # (E, F, Wcam)
    hy = pos[..., 1:2] + r_hit * u_dir[..., 1]
    hrow, hcol, hinb = occupancy._cell_idx(hx, hy, mp)
    hok = hinb & (r_hit < occupancy.BIG)
    hrow = jnp.where(hok, hrow, -1).astype(jnp.float32)
    hcol = jnp.where(hok, hcol, -1).astype(jnp.float32)
    if Wt > cam.width:
        padw = ((0, 0), (0, 0), (0, Wt - cam.width))
        hrow = jnp.pad(hrow, padw, constant_values=-1.0)
        hcol = jnp.pad(hcol, padw, constant_values=-1.0)
    hcol_t = hcol.reshape(E, F * Wt, 1)    # sublane layout for the C factor

    WH = min(_row_window_cells(cam, mp), H)
    row_d = (pos[..., 1] - mp.origin_y) / mp.resolution
    r0 = jnp.clip(jnp.round(row_d - WH / 2 + 4), 0,
                  max(H - WH, 0)).astype(jnp.int32)
    r8 = r0 // 8                                           # (E, F)
    ox = jnp.full((E, F), mp.origin_x + 0.5 * mp.resolution)
    oy = jnp.full((E, F), mp.origin_y + 0.5 * mp.resolution)
    sc = jnp.stack([ox, oy, pos[..., 0], pos[..., 1], jnp.cos(psi),
                    jnp.sin(psi), jnp.zeros_like(psi),
                    jnp.zeros_like(psi)], axis=2)          # (E, F, 8)
    call = _fuse_call_v3(_E_B, F, H, W, WH, Wt, cam.width, cam.fx,
                         mp.resolution, occupancy._l(mp.prob_hit),
                         occupancy._l(mp.prob_miss),
                         occupancy._l(mp.clamp_min),
                         occupancy._l(mp.clamp_max), interpret)
    return call(logodds, tabs.reshape(E, -1), hrow, hcol_t, sc, r8)


@functools.lru_cache(maxsize=None)
def _flat_fuse_multi(cam: CameraParams, mp: MapParams, row_stride: int,
                     interpret: bool):
    @jax.custom_batching.custom_vmap
    def fuse_flat(logodds, depths, pos, quat):
        return _fuse_flat_multi(logodds, depths, pos, quat, cam, mp,
                                row_stride, interpret)

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


def _fuse_flat(logodds, depth, pos, quat, cam: CameraParams, mp: MapParams,
               row_stride: int, interpret: bool):
    E, H, W = logodds.shape
    Wt = -(-cam.width // 128) * 128    # table padded to whole 128-lane vregs

    r_hit, r_carve, u_dir = jax.vmap(
        lambda d, p, q: occupancy.polar_columns(d, p, q, cam, mp, row_stride)
    )(depth, pos, quat)
    tabs = r_carve                                         # (E, Wcam)
    if Wt > cam.width:
        # pad value is never selected (valid gates uidx <= Wcam-1); 0 carves
        # nothing even if it were
        tabs = jnp.pad(tabs, ((0, 0), (0, Wt - cam.width)))

    fwd = jax.vmap(lambda q: frames.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
                   )(quat)
    psi = jnp.arctan2(fwd[:, 1], fwd[:, 0])

    if W % 128 == 0 and H % 8 == 0:
        # v2: whole-grid blocks, in-kernel 8-aligned row window — no host
        # dynamic_slice / dynamic_update_slice pair (the vmapped per-env
        # offsets cost ~36 ms/frame at B=4096, 4x the update kernel)
        WH = min(_row_window_cells(cam, mp), H)
        row_d = (pos[:, 1] - mp.origin_y) / mp.resolution
        # +4 biases the center to split the in-kernel floor-to-8 slack
        r0 = jnp.clip(jnp.round(row_d - WH / 2 + 4), 0,
                      max(H - WH, 0)).astype(jnp.int32)
        r8 = r0 // 8
        ox = jnp.full((E,), mp.origin_x + 0.5 * mp.resolution)
        oy = jnp.full((E,), mp.origin_y + 0.5 * mp.resolution)
        sc = jnp.stack([ox, oy, pos[:, 0], pos[:, 1], jnp.cos(psi),
                        jnp.sin(psi), jnp.zeros_like(psi),
                        jnp.zeros_like(psi)], axis=1)
        call = _fuse_call_v2(_E_B, H, W, WH, Wt, cam.width, cam.fx,
                             mp.resolution,
                             occupancy._l(mp.prob_miss),
                             occupancy._l(mp.clamp_min),
                             occupancy._l(mp.clamp_max), interpret)
        return _scatter_hits(call(logodds, tabs, sc, r8), r_hit, u_dir,
                             pos, mp)

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
                      occupancy._l(mp.prob_miss),
                      occupancy._l(mp.clamp_min), occupancy._l(mp.clamp_max),
                      interpret)
    new_wins = call(wins, tabs, sc)
    out = jax.vmap(lambda lo, wn, r, c: jax.lax.dynamic_update_slice(
        lo, wn, (r, c)))(logodds, new_wins, r0, c0)
    return _scatter_hits(out, r_hit, u_dir, pos, mp)


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
