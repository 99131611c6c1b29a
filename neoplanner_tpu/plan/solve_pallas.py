"""The WHOLE trajectory solve in one Pallas program (scene backend).

BENCH_r03's roofline extras showed the plan stage is bound by neither the
VPU nor HBM (5-8% of both peaks) but by the *sequential* L-BFGS iteration
chain: each iteration is ~6 kernel/XLA dispatches data-dependent on the
previous one, so a 24-iteration solve pays ~150 round trips of launch
latency. This kernel runs the full solver loop — two-loop recursion with
per-lane ring history, data-parallel backtracking line search, the fused
objective/adjoint evaluations (costs_pallas.scene_value /
scene_valgrad_values) — inside one program per 512-lane tile: the only
dispatch is the solve itself.

Semantics mirror ops/lbfgs.minimize exactly (masked fixed-iteration form):
same Armijo-first/best-fallback step pick, curvature-guarded history,
per-lane convergence freezing, NaN guards. The iteration and line-search
loops are while_loops with ALL-LANE early exit (round 4): the program stops
iterating once every lane in the tile is converged/frozen, and the line
search stops once every lane has an Armijo-accepted step — both exits are
bit-exactness-preserving (a finished lane's state is frozen either way;
an Armijo-ok lane's step is pinned at its FIRST success and later
candidates only fed the unused best-fallback), so results are identical
to the fixed-trip form while typical solves skip most of the max_iters *
max_ls objective evaluations — the reference's sequential ladder stops
early too (expert_planner.py:161-168), so this is parity of *work*.
Golden test: tests/test_solve_pallas.py pins the solved cost against the
XLA solver on identical problems.

Enabled in plan/expert.solve_one by NEO_SOLVER=kernel. The sensed-grid
analog (per-env VMEM window tiling instead of flat 512-lane tiles) is
plan/solve_pallas_grid.py; both share :func:`lbfgs_in_kernel`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neoplanner_tpu.config import PlannerParams
from neoplanner_tpu.mapping import scene as scene_map
from neoplanner_tpu.plan.costs_pallas import (_NB, _static, pack_prims,
                                              scene_valgrad_values,
                                              scene_value)


def lbfgs_in_kernel(vg, fwd, x0, max_iters, history, max_ls, ftol, gtol, c1,
                    skip=None):
    """The masked L-BFGS loop on (nv, NB) decision rows, inside a kernel.

    vg(x) -> (f (NB,), g (nv, NB)); fwd(x) -> f (NB,). Semantics mirror
    ops/lbfgs.minimize (fixed-iteration masked form: finished lanes freeze).
    Shared by the scene solver below and the grid solver
    (plan/solve_pallas_grid.py). skip, if given, is an (NB,) f32 0/1 mask of
    lanes frozen from iteration 0 (the lazy bank: retry lanes of envs whose
    primary already accepted) — they return x0/f0 with iters=0, and a tile
    whose every lane is skipped exits before its first iteration.
    Returns (x, f, iters int32)."""
    m = history
    nv, NB = x0.shape
    f0, g0 = vg(x0)
    # NOTE all loop-carried lane masks are f32 0/1, NOT bool: Mosaic's
    # remote compiler crashes (tpu_compile_helper exit 1) on (NB,) bool
    # vectors in fori_loop carries — bisected 2026-08-17; bool
    # *intermediates* inside a body are fine. Same for exp2 of the loop
    # index: the line search halves a carried step instead.
    done0 = jnp.where(
        jnp.isnan(f0) | (jnp.max(jnp.abs(g0), axis=0) <= gtol), 1.0, 0.0)
    if skip is not None:
        done0 = jnp.maximum(done0, skip)

    def select_slot(hist, idx):
        """hist: m-tuple of (rows..., NB); idx (NB,) -> per-lane pick.
        Mosaic has no scatter/gather on values, so the ring buffers are
        per-slot tuples and selection/update are masked elementwise ops."""
        out = jnp.zeros_like(hist[0])
        for slot in range(m):
            sel = (idx == slot).astype(jnp.float32)
            out = out + sel * hist[slot]
        return out

    def cond(carry):
        # ALL-LANE early exit: done lanes are frozen by the masked updates
        # below, so stopping once every lane is done is bit-exact vs the
        # fixed max_iters trip count (itc is a scalar trip counter; the
        # per-lane `it` freezes and reports each lane's own iterations)
        itc, done = carry[0], carry[-1]
        return (itc < max_iters) & (jnp.min(done) < 0.5)

    def body(carry):
        (itc, x, f, g, s_hist, y_hist, rho, headi, count, it, done) = carry

        # ---- two-loop recursion (ops/lbfgs._two_loop)
        q = g
        alphas = [jnp.zeros((NB,), jnp.float32) for _ in range(m)]
        for ii in range(m):
            idx = jnp.mod(headi - 1 - ii, m)
            s_sel = select_slot(s_hist, idx)
            y_sel = select_slot(y_hist, idx)
            r_sel = select_slot(rho, idx)
            valid = (ii < count).astype(jnp.float32)
            alpha = r_sel * jnp.sum(s_sel * q, axis=0) * valid
            q = q - alpha * y_sel
            for slot in range(m):
                alphas[slot] = jnp.where(idx == slot, alpha,
                                         alphas[slot])
        newest = jnp.mod(headi - 1, m)
        s_new = select_slot(s_hist, newest)
        y_new = select_slot(y_hist, newest)
        sy = jnp.sum(s_new * y_new, axis=0)
        yy = jnp.sum(y_new * y_new, axis=0)
        gamma = jnp.where(count > 0, sy / jnp.maximum(yy, 1e-20), 1.0)
        r = gamma * q
        for ii in range(m):
            idx = jnp.mod(headi - count + ii, m)
            s_sel = select_slot(s_hist, idx)
            y_sel = select_slot(y_hist, idx)
            r_sel = select_slot(rho, idx)
            a_sel = select_slot(alphas, idx)
            valid = (ii < count).astype(jnp.float32)
            beta = r_sel * jnp.sum(y_sel * r, axis=0) * valid
            r = r + s_sel * (a_sel - beta) * valid
        d = -r

        gtd = jnp.sum(g * d, axis=0)
        bad = (gtd >= 0.0) | jnp.isnan(gtd)
        d = jnp.where(bad, -g, d)
        gtd = jnp.where(bad, -jnp.sum(g * g, axis=0), gtd)

        t0 = jnp.where(it == 0,
                       jnp.minimum(1.0, 1.0 / jnp.maximum(
                           jnp.sum(jnp.abs(g), axis=0), 1e-12)),
                       1.0)

        # ---- backtracking line search (same candidate schedule as
        # ops/lbfgs.minimize: t0 * 0.5^k) as a nested while_loop — one
        # objective trace in the compiled body instead of max_ls inlined
        # copies, and an ALL-LANE early exit: once every lane has an
        # Armijo-accepted step the remaining candidates can only change the
        # best-fallback fields, which accepted lanes never read — so exiting
        # is bit-exact and typical iterations pay 1-2 forwards, not max_ls.
        # All carried masks are f32 (see NOTE above); the step halves each
        # trip instead of exp2(-k) of the loop index.
        def ls_cond(ls_carry):
            k, ls_ok = ls_carry[0], ls_carry[1]
            return (k < max_ls) & (jnp.min(ls_ok) < 0.5)

        def ls_body(ls_carry):
            k, ls_ok, t_cur, t_first, f_first, f_best, t_best = ls_carry
            f_k = fwd(x + t_cur * d)
            ok_k = jnp.where(f_k <= f + c1 * t_cur * gtd, 1.0, 0.0)
            newly = ok_k * (1.0 - ls_ok) > 0.5
            t_first = jnp.where(newly, t_cur, t_first)
            f_first = jnp.where(newly, f_k, f_first)
            safe = jnp.where(jnp.isnan(f_k), jnp.inf, f_k)
            better = safe < f_best
            return (k + 1, jnp.maximum(ls_ok, ok_k), t_cur * 0.5,
                    t_first, f_first,
                    jnp.where(better, safe, f_best),
                    jnp.where(better, t_cur, t_best))

        _, ls_ok, _, t_first, f_first, f_best, t_best = jax.lax.while_loop(
            ls_cond, ls_body,
            (jnp.zeros((), jnp.int32), jnp.zeros_like(t0), t0,
             jnp.zeros_like(t0), jnp.zeros_like(f),
             jnp.full_like(f, jnp.inf), jnp.zeros_like(t0)))
        ok_b = ls_ok > 0.5
        t_sel = jnp.where(ok_b, t_first, t_best)
        f_try = jnp.where(ok_b, f_first, f_best)

        accept = ok_b | (f_try < f)
        x_new = jnp.where(accept, x + t_sel * d, x)
        f_new, g_new = vg(x_new)

        # ---- curvature-guarded history update
        s = x_new - x
        y = g_new - g
        ys = jnp.sum(y * s, axis=0)
        store = accept & (ys > 1e-10) & (done < 0.5)
        rho_new = 1.0 / jnp.maximum(ys, 1e-20)
        s_hist = tuple(
            jnp.where(store & (headi == slot), s, s_hist[slot])
            for slot in range(m))
        y_hist = tuple(
            jnp.where(store & (headi == slot), y, y_hist[slot])
            for slot in range(m))
        rho = tuple(
            jnp.where(store & (headi == slot), rho_new, rho[slot])
            for slot in range(m))
        headi2 = jnp.where(store, jnp.mod(headi + 1, m), headi)
        count2 = jnp.where(store, jnp.minimum(count + 1, m), count)

        f_drop = (f - f_new) / jnp.maximum(
            jnp.maximum(jnp.abs(f), jnp.abs(f_new)), 1.0)
        done_new = ((f_drop <= ftol) & accept) \
            | (jnp.max(jnp.abs(g_new), axis=0) <= gtol) \
            | (~accept) | jnp.isnan(f_new)

        # freeze lanes that were already done
        frz = done > 0.5

        def keep(old, new):
            return jnp.where(frz, old, new)

        return (itc + 1, keep(x, x_new), keep(f, f_new), keep(g, g_new),
                s_hist, y_hist, rho,
                keep(headi, headi2), keep(count, count2),
                jnp.where(frz, it, it + 1),
                jnp.maximum(done, jnp.where(done_new, 1.0, 0.0)))

    init = (jnp.zeros((), jnp.int32), x0, f0, g0,
            tuple(jnp.zeros_like(x0) for _ in range(m)),
            tuple(jnp.zeros_like(x0) for _ in range(m)),
            tuple(jnp.zeros_like(f0) for _ in range(m)),
            jnp.zeros((NB,), jnp.int32), jnp.zeros((NB,), jnp.int32),
            jnp.zeros((NB,), jnp.int32), done0)
    out = jax.lax.while_loop(cond, body, init)
    return out[1], out[2], out[9]


def _make_solver_kernel(statics, n_prims, max_iters, history, max_ls,
                        ftol, gtol, c1):
    (M, D, K, t_min, t_max, v_max, safe_dis, w_e, w_t, w_f, w_c) = statics

    def kernel(x_ref, head_ref, tail_ref, prims_ref, skip_ref,
               xout_ref, fout_ref, it_ref):
        # lazy-bank fast path: a tile whose every lane is skipped skips even
        # the initial value_and_grad (f is 0 there, not f0 — no caller reads
        # f of a skipped lane; solve_one consumes only x and iters)
        all_skipped = jnp.min(skip_ref[0]) >= 0.5

        @pl.when(jnp.logical_not(all_skipped))
        def _solve():
            def vg(x):
                f, g_rows = scene_valgrad_values(
                    M, K, t_min, t_max, v_max, safe_dis, w_e, w_t, w_f, w_c,
                    n_prims, x, head_ref, tail_ref, prims_ref)
                return f, jnp.stack(g_rows)

            def fwd(x):
                return scene_value(M, K, t_min, t_max, v_max, safe_dis, w_e,
                                   w_t, w_f, w_c, n_prims, x, head_ref,
                                   tail_ref, prims_ref)

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


def _pad_lanes(a, np_):
    pad = np_ - a.shape[0]
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return a


def _solve_batch(x0, head, tail, prims, skip, statics, opts, interpret,
                 do_sort):
    N, nv = x0.shape
    D = statics[1]
    n_prims = prims.shape[1]
    inv = None
    if do_sort:
        # lazy bank: cluster the active (skip=0) problems into the leading
        # 512-lane tiles so skipped tiles exit whole (masked lanes inside a
        # SIMD tile save nothing — only all-skipped tiles do). Stable argsort
        # keeps actives in original relative order; inverse-permute after.
        order = jnp.argsort(skip, stable=True)
        inv = jnp.argsort(order, stable=True)
        x0, head, tail = x0[order], head[order], tail[order]
        prims, skip = prims[order], skip[order]
    np_ = N + ((-N) % _NB)
    x_t = _pad_lanes(x0, np_).T.astype(jnp.float32)
    head_t = _pad_lanes(head.reshape(N, 3 * D), np_).T.astype(jnp.float32)
    tail_t = _pad_lanes(tail.reshape(N, 3 * D), np_).T.astype(jnp.float32)
    prims_t = _pad_lanes(prims.reshape(N, n_prims * 6),
                         np_).T.astype(jnp.float32)
    # pad lanes count as skipped so an all-pad tile exits too
    skip_t = jnp.concatenate(
        [skip.astype(jnp.float32), jnp.ones((np_ - N,), jnp.float32)]
    )[None, :]
    kernel = _make_solver_kernel(statics, n_prims, *opts)
    spec = lambda rows: pl.BlockSpec((rows, _NB), lambda i: (0, i),  # noqa: E731
                                     memory_space=pltpu.VMEM)
    max_iters = opts[0]
    S = statics[0] * statics[2]
    x, f, iters = pl.pallas_call(
        kernel,
        grid=(np_ // _NB,),
        in_specs=[spec(nv), spec(3 * D), spec(3 * D), spec(n_prims * 6),
                  spec(1)],
        out_specs=(spec(nv), spec(1), spec(1)),
        out_shape=(jax.ShapeDtypeStruct((nv, np_), jnp.float32),
                   jax.ShapeDtypeStruct((1, np_), jnp.float32),
                   jax.ShapeDtypeStruct((1, np_), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=max_iters * (opts[2] + 3) * (6 * statics[0] * 60
                                               + S * (15 + n_prims * 18))
            * np_,
            bytes_accessed=(2 * nv + 12 + n_prims * 6) * 4 * np_,
            transcendentals=max_iters * statics[0] * np_),
    )(x_t, head_t, tail_t, prims_t, skip_t)
    x, f, iters = x.T[:N], f[0, :N], iters[0, :N]
    if inv is not None:
        x, f, iters = x[inv], f[inv], iters[inv]
    return x, f, iters


def _collapse_rule(fn):
    def rule(axis_size, in_batched, *args):
        flat = []
        for a, b in zip(args, in_batched):
            if not b:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            flat.append(a.reshape((-1,) + a.shape[2:]))
        out = fn(*flat)
        return tuple(o.reshape((axis_size, -1) + o.shape[1:])
                     for o in out), (True,) * len(out)
    return rule


@functools.lru_cache(maxsize=None)
def _flat_solver(statics, n_prims, opts, interpret, do_sort):
    @jax.custom_batching.custom_vmap
    def solve_flat(x0, head, tail, prims, skip):
        return _solve_batch(x0, head, tail, prims, skip, statics, opts,
                            interpret, do_sort)

    solve_flat.def_vmap(_collapse_rule(solve_flat))
    return solve_flat


def solve_scene(x0: jnp.ndarray, head_state: jnp.ndarray,
                tail_state: jnp.ndarray, scene: scene_map.SceneMap,
                pp: PlannerParams, ftol: float = 1e-10, gtol: float = 1e-8,
                c1: float = 1e-4, interpret: bool = False, skip=None):
    """Solve one scene-backend trajectory optimization entirely in-kernel.

    Single-problem signature, vmappable at any nesting (custom_vmap
    collapse). Returns (x (nv,), f (), iters () int32) — the ops/lbfgs
    result fields the planner consumes. skip, if given, is a 0/1 scalar
    (vmapped: per-problem) marking problems whose solve may be skipped
    entirely — they return (x0, 0, 0); the flat batch is stably sorted so
    skipped problems cluster into tiles that exit before their first
    iteration (the lazy bank, plan/expert.py)."""
    assert pp.sampling == "relative", "kernel implements relative sampling"
    prims = pack_prims(scene)
    opts = (pp.max_iters, pp.history, pp.max_ls, ftol, gtol, c1)
    do_sort = skip is not None
    if skip is None:
        skip = jnp.zeros((), jnp.float32)
    else:
        skip = skip.astype(jnp.float32)
    fn = _flat_solver(_static(pp), prims.shape[0], opts, interpret, do_sort)
    x, f, iters = fn(x0[None], head_state[None], tail_state[None],
                     prims[None], skip[None])
    return x[0], f[0], iters[0]
