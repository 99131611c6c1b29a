"""Pallas TPU kernel for the batched banded Givens-QR solve (ops/minco.py).

The MINCO cost evaluation solves one tiny (6M x 6M, M=3 -> 18x18) banded
system per multi-start lane per line-search candidate. The pure-XLA unrolled
Givens solve (ops/minco._givens_solve) is numerically right but compiles to
~150 dependent vector ops of (batch, 19) — each a separate XLA op whose launch
overhead dominates at these sizes. This kernel runs the identical rotation
sequence *inside one Pallas program* per batch tile: the whole factorization
stays in registers/VMEM, there is one launch per 512-problem tile, and the
arithmetic is the same to f32 roundoff (tests/test_minco_pallas.py asserts
golden equality against the XLA path).

Batching: callers vmap the solve at several levels (env x lane x candidate).
A vmapped pallas_call would get a prepended grid dimension and run one tiny
program per env. ``_flat_solver`` is therefore a ``jax.custom_vmap`` whose
rule flattens any number of mapped axes into the leading batch axis and calls
itself recursively — every vmap nesting collapses into one fat kernel call.
(CLAUDE.md round-1 note: "needs explicit batching through the L-BFGS loop or
custom_vmap" — this is the custom_vmap form.)

The backward pass reuses the same kernel on the transposed band (implicit
differentiation, see ops/minco.solve_banded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NB = 512  # problems per Pallas program (batch tile, lane-major layout)


def _make_kernel(n: int, d: int, lower_bw: int, fill: int):
    """Kernel solving a (n x n) banded system with d right-hand sides for a
    (n, n+d, NB) tile of problems: batch rides the lane axis."""

    def kernel(aug_ref, out_ref):
        rows = [aug_ref[r] for r in range(n)]          # each (n+d, NB)
        for c in range(n):
            for r in range(c + 1, min(c + lower_bw + 1, n)):
                a_cc = rows[c][c]                      # (NB,)
                a_rc = rows[r][c]
                denom = jnp.sqrt(a_cc * a_cc + a_rc * a_rc)
                safe = denom > 1e-20
                inv = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
                cs = jnp.where(safe, a_cc * inv, 1.0)
                sn = a_rc * inv
                rc, rr = rows[c], rows[r]
                rows[c] = cs[None, :] * rc + sn[None, :] * rr
                rows[r] = cs[None, :] * rr - sn[None, :] * rc
        xs = [None] * n
        for c in range(n - 1, -1, -1):
            acc = rows[c][n:]                          # (d, NB)
            for j in range(c + 1, min(c + fill + 1, n)):
                acc = acc - rows[c][j][None, :] * xs[j]
            xs[c] = acc / rows[c][c][None, :]
        for c in range(n):
            out_ref[c] = xs[c]

    return kernel


def _solve_batch(A: jnp.ndarray, b: jnp.ndarray, lower_bw: int, fill: int,
                 interpret: bool) -> jnp.ndarray:
    """A (N, n, n), b (N, n, d) -> x (N, n, d) via the Pallas kernel."""
    N, n, _ = A.shape
    d = b.shape[2]
    pad = (-N) % _NB
    if pad:
        # identity systems in the padded lanes keep every division finite
        A = jnp.concatenate(
            [A, jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))])
        b = jnp.concatenate([b, jnp.zeros((pad, n, d), b.dtype)])
    aug = jnp.concatenate([A, b], axis=2)              # (Np, n, n+d)
    aug_t = jnp.transpose(aug, (1, 2, 0)).astype(jnp.float32)  # (n, n+d, Np)
    grid = aug_t.shape[2] // _NB
    out = pl.pallas_call(
        _make_kernel(n, d, lower_bw, fill),
        grid=(grid,),
        in_specs=[pl.BlockSpec((n, n + d, _NB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, d, _NB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d, aug_t.shape[2]), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(lower_bw * n * 6 * (n + d) + n * fill * d * 2) * N,
            bytes_accessed=(n * (n + d) + n * d) * 4 * N,
            transcendentals=0),
    )(aug_t)
    return jnp.transpose(out, (2, 0, 1))[:N]           # (N, n, d)


@functools.lru_cache(maxsize=None)
def _flat_solver(n: int, d: int, lower_bw: int, fill: int, interpret: bool):
    """custom_vmap solver over a flat (N, n, n) x (N, n, d) batch; any further
    vmap axes are folded into N by the rule below (recursively)."""

    @jax.custom_batching.custom_vmap
    def solve_flat(A, b):
        return _solve_batch(A, b, lower_bw, fill, interpret)

    @solve_flat.def_vmap
    def _rule(axis_size, in_batched, A, b):
        A_b, b_b = in_batched
        if not A_b:
            A = jnp.broadcast_to(A[None], (axis_size,) + A.shape)
        if not b_b:
            b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
        Af = A.reshape((-1,) + A.shape[2:])
        bf = b.reshape((-1,) + b.shape[2:])
        out = solve_flat(Af, bf)                       # recursion keeps the
        out = out.reshape(A.shape[:2] + out.shape[1:])  # custom_vmap wrapper
        return out, True

    return solve_flat


def solve_one(A: jnp.ndarray, b: jnp.ndarray, lower_bw: int, fill: int,
              interpret: bool = False) -> jnp.ndarray:
    """Single-problem entry: A (n, n), b (n, d). vmap at any nesting depth
    collapses into one fat kernel call via the custom_vmap rule."""
    n = A.shape[0]
    d = b.shape[1]
    return _flat_solver(n, d, lower_bw, fill, interpret)(A[None], b[None])[0]
