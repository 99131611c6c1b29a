"""Pallas TPU kernel for the EDT min-plus contraction (pass 2 of ops/edt.py).

The row pass of the exact EDT is out[i, j] = min_k ((i-k)² + g2[k, j]) — an
O(H²W) min-plus contraction that XLA executes as blocked broadcasts with large
HBM temporaries. This kernel keeps one (H, W) map slab plus a (BLOCK_I, W)
output tile in VMEM and accumulates the min over k in registers: one HBM read
of g2 per output tile row-block, no temporaries.

Grid: (batch, H / BLOCK_I). Under jax.vmap the batch axis is the leading grid
dimension, so vmapped callers (one map per env) run one program per
(env, row-block) — each program still processes a full (BLOCK_I, W) VPU tile.

Used by mapping/esdf.build on TPU; the pure-XLA path (ops/edt.py) remains the
portable/interpret fallback and the golden reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_I = 8


_KB = 8  # contraction rows processed per inner step


def _pass2_kernel(g2_ref, out_ref):
    """g2_ref: (H, W) squared row distances; out_ref: (BLOCK_I, W) tile."""
    ib = pl.program_id(0)
    H = g2_ref.shape[0]
    W = g2_ref.shape[1]

    i0 = ib * BLOCK_I
    # iota must be integer-typed on TPU; cast after
    rows = (jax.lax.broadcasted_iota(jnp.int32, (BLOCK_I, 1, 1), 0)
            + i0).astype(jnp.float32)                      # (BLOCK_I, 1, 1)
    kof = jax.lax.broadcasted_iota(jnp.int32, (1, _KB, 1), 1).astype(
        jnp.float32)                                       # (1, KB, 1)

    def body(kb, acc):
        k0 = (kb * _KB).astype(jnp.float32)
        dk = rows - (k0 + kof)                             # (BLOCK_I, KB, 1)
        g = g2_ref[pl.ds(kb * _KB, _KB), :]                # (KB, W)
        cand = dk * dk + g[None, :, :]                     # (BLOCK_I, KB, W)
        return jnp.minimum(acc, jnp.min(cand, axis=1))

    acc0 = jnp.full((BLOCK_I, W), 1e9, dtype=jnp.float32)
    out_ref[:, :] = jax.lax.fori_loop(0, H // _KB, body, acc0)


def _make_banded_kernel(r8: int, r2: float):
    """Like _pass2_kernel, but the k-contraction only visits the aligned
    8-row blocks covering the band [i-R, i+R] around the output block (all
    loads land on multiples of BLOCK_I — Mosaic requires provably aligned
    sublane indices). Rows beyond the band contribute d² > R² candidates,
    which only tighten the min toward the exact transform — still a valid
    truncated field."""
    n_blocks = (BLOCK_I + 2 * r8) // BLOCK_I

    def kernel(g2p_ref, out_ref):
        ib = pl.program_id(0)
        i0 = ib * BLOCK_I
        W = out_ref.shape[1]
        # output rows in padded coordinates: i0 + r8 + r, r in [0, BLOCK_I)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (BLOCK_I, 1, 1), 0)
                + r8).astype(jnp.float32)
        kof = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK_I, 1),
                                       1).astype(jnp.float32)
        acc = jnp.full((BLOCK_I, W), r2, dtype=jnp.float32)
        for j in range(n_blocks):
            dk = rows - (float(j * BLOCK_I) + kof)       # (B, B, 1)
            g = g2p_ref[pl.ds(i0 + j * BLOCK_I, BLOCK_I), :]
            cand = dk * dk + g[None, :, :]               # (B, B, W)
            acc = jnp.minimum(acc, jnp.min(cand, axis=1))
        out_ref[:, :] = acc

    return kernel


def pass2_banded(g2: jnp.ndarray, radius: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Banded min-plus over rows, clamped at radius² — the truncated-EDT
    pass 2 (ops/edt._pass2_banded). The XLA form materializes each of the
    2R+1 shifted (H, W) fields through HBM; here the whole (padded) slab sits
    in VMEM and the min accumulates in registers, so the only HBM traffic is
    one read of g2 and one write of the result per env."""
    H, W = g2.shape
    assert H % BLOCK_I == 0, H
    r2 = float(radius * radius)
    r8 = -(-radius // BLOCK_I) * BLOCK_I
    big = jnp.full((r8, W), 1e9, jnp.float32)
    g2p = jnp.concatenate([big, jnp.minimum(g2.astype(jnp.float32), r2), big])
    return pl.pallas_call(
        _make_banded_kernel(r8, r2),
        interpret=interpret,
        grid=(H // BLOCK_I,),
        in_specs=[pl.BlockSpec((H + 2 * r8, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK_I, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * (BLOCK_I + 2 * r8) * H * W,
            bytes_accessed=2 * H * W * 4,
            transcendentals=0),
    )(g2p)


def pass2(g2: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """min-plus contraction over rows: (H, W) -> (H, W). H must be a multiple
    of BLOCK_I (mapping grids are; ops/edt.py pads otherwise)."""
    H, W = g2.shape
    assert H % BLOCK_I == 0, H
    return pl.pallas_call(
        _pass2_kernel,
        interpret=interpret,
        grid=(H // BLOCK_I,),
        in_specs=[pl.BlockSpec((H, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK_I, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=3 * H * H * W,
                                      bytes_accessed=2 * H * W * 4,
                                      transcendentals=0),
    )(g2.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Fused truncated rebuild: log-odds -> bf16 truncated ESDF in ONE program.
#
# The vision loop's per-segment rebuild (sim/env.rebuild_esdf) was a chain of
# XLA passes — binarize, two cummax scans (pass 1), the banded pass-2 kernel,
# sqrt, clamp, bf16 cast — each a full HBM round-trip of the (H, W) grid per
# env (~25x off the HBM roofline at B=4096). Truncation makes pass 1 banded
# too (any true distance < R has its row offset inside the band), so the
# whole transform is 4R shifted min-adds on a VMEM-resident slab:
#
#   pass 1 (lanes):    g2[i,j]  = min_{|d|<=R, occ(i,j+d)} d²,  else (R+1)²
#   pass 2 (sublanes): d2[i,j]  = min(R², min_{|d|<=R} d² + g2[i+d,j])
#
# One HBM read of the f32 log-odds, one bf16 write of the field per env.
# Golden: ops/edt.edt_truncated over mapping/occupancy.to_occupancy
# (tests/test_edt.py).
# ---------------------------------------------------------------------------


def _make_fused_trunc_kernel(H, W, radius, thr, res, max_dist):
    r2c = float((radius + 1) ** 2)     # pass-1 clamp (out-of-band rows)
    r2 = float(radius * radius)        # pass-2 clamp (the field's ceiling)

    def kernel(lo_ref, out_ref):
        lo = lo_ref[0]                                     # (H, W)
        g = jnp.where(lo > thr, 0.0, r2c)                  # d² = 0 when occupied
        col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

        acc = g
        for d in range(1, radius + 1):
            dd = float(d * d)
            # roll takes non-negative shifts only; W-d ≡ -d cyclically
            dn = jnp.where(col < W - d, pltpu.roll(g, W - d, 1), r2c)
            up = jnp.where(col >= d, pltpu.roll(g, d, 1), r2c)
            acc = jnp.minimum(acc, jnp.minimum(dn, up) + dd)

        g2 = acc                                           # already <= r2c
        out = jnp.minimum(g2, r2)
        for d in range(1, min(radius, H - 1) + 1):
            dd = float(d * d)
            dn = jnp.where(row < H - d, pltpu.roll(g2, H - d, 0), r2c)
            up = jnp.where(row >= d, pltpu.roll(g2, d, 0), r2c)
            out = jnp.minimum(out, jnp.minimum(dn, up) + dd)

        dist = jnp.sqrt(jnp.minimum(out, r2)) * res
        out_ref[0] = jnp.minimum(dist, max_dist).astype(out_ref.dtype)

    return kernel


def _fused_trunc_flat(lo, radius, thr, res, max_dist, interpret):
    E, H, W = lo.shape
    return pl.pallas_call(
        _make_fused_trunc_kernel(H, W, radius, thr, res, max_dist),
        interpret=interpret,
        grid=(E,),
        in_specs=[pl.BlockSpec((1, H, W), lambda e: (e, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda e: (e, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, H, W), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=E * H * W * 8 * radius,
            bytes_accessed=E * H * W * 6,
            transcendentals=E * H * W),
    )(lo.astype(jnp.float32))


def rebuild_truncated_lite(logodds: jnp.ndarray, thr: float, resolution,
                           max_dist: float,
                           interpret: bool = False) -> jnp.ndarray:
    """bf16 truncated ESDF straight from a log-odds grid; single-env
    signature, vmappable (custom_vmap collapse)."""
    import math as _math
    radius = max(1, int(_math.ceil(max_dist / float(resolution))))
    return _flat_trunc(radius, float(thr), float(resolution),
                       float(max_dist), interpret)(logodds[None])[0]


@functools.lru_cache(maxsize=None)
def _flat_trunc(radius, thr, res, max_dist, interpret):
    @jax.custom_batching.custom_vmap
    def fused(lo):
        return _fused_trunc_flat(lo, radius, thr, res, max_dist, interpret)

    def rule(axis_size, in_batched, lo):
        flat = lo.reshape((-1,) + lo.shape[2:])
        out = fused(flat)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    fused.def_vmap(rule)
    return fused
