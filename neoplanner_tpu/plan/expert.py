"""Expert minimum-jerk planner: device L-BFGS with parallel multi-start.

Re-design of the reference MinJerkPlanner
(/root/reference/src/planner/scripts/traj_planner/expert_planner.py:28-237) for TPU:

- The reference's *sequential* retry ladder — 3 multi-start seeds tried in order
  (batch_plan, :142-168), then up to 5 noisy re-seeds on collision rejection
  (warm_start_plan, :186-203) — becomes a single *parallel* bank of seeds solved by
  one vmapped L-BFGS, followed by a masked argmin selection. Failure is data (an
  ``ok`` flag), not an exception.
- Seed construction matches the reference: straight-line interpolation, ±0.6 m
  lateral offsets (batch_generate_init_variables, :103-140), N(0, 0.5) waypoint noise
  for retries (:93-94), init durations init_T·[1.5, 1, ..., 1.5] (:97-99).
- Acceptance matches plan_once (:235-237): weighted collision cost must not exceed
  ``collision_cost_tol``.

Everything here is pure and vmappable over an env axis (pass a batched ESDFMap and
batched states through ``jax.vmap``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from neoplanner_tpu.config import PlannerParams
from neoplanner_tpu.core.types import ESDFMap, Trajectory
from neoplanner_tpu.ops import lbfgs, minco
from neoplanner_tpu.plan import costs as costs_mod


def init_ts(pp: PlannerParams) -> jnp.ndarray:
    """init_T per piece, first/last scaled 1.5x (expert_planner.py:97-99)."""
    ts = jnp.full((pp.num_pieces,), pp.init_t)
    return ts.at[0].mul(1.5).at[-1].mul(1.5)


def straight_line_wpts(start_pos: jnp.ndarray, target_pos: jnp.ndarray,
                       pp: PlannerParams) -> jnp.ndarray:
    """(D, M-1) evenly spaced interior waypoints (expert_planner.py:91-92)."""
    n = pp.num_wpts
    fracs = (jnp.arange(1, n + 1) / (n + 1))[:, None]
    wpts = start_pos[None, :] + fracs * (target_pos - start_pos)[None, :]
    return wpts.T


def seed_bank(start_pos: jnp.ndarray, target_pos: jnp.ndarray, key: jnp.ndarray,
              pp: PlannerParams) -> jnp.ndarray:
    """All multi-start + retry seeds as one (B, D, M-1) array.

    Layout: [straight, +lateral, -lateral, wide laterals, noisy x retry_num]. The
    first batch_num lanes reproduce batch_generate_init_variables
    (expert_planner.py:113-130); the wide lanes (extra_lateral_scales) go beyond the
    reference to escape the zero-gradient ESDF plateau behind obstacles wider than
    the ±0.6 m ladder can clear; the noisy tail reproduces the sequential
    re-seeding of warm_start_plan (:193-200) as parallel lanes.
    """
    straight = straight_line_wpts(start_pos, target_pos, pp)      # (D, n)
    diff = target_pos - start_pos
    longi = diff / (jnp.linalg.norm(diff) + 1e-9)
    lat = jnp.stack([longi[1], -longi[0]])

    seeds = [straight]
    sign = 1.0
    for _ in range(pp.batch_num - 1):
        seeds.append(straight + sign * pp.lateral_move_dis * lat[:, None])
        sign = -sign
    for scale in pp.extra_lateral_scales:
        seeds.append(straight + scale * pp.lateral_move_dis * lat[:, None])
    noise = pp.retry_noise_std * jax.random.normal(
        key, (pp.retry_num,) + straight.shape)
    for r in range(pp.retry_num):
        seeds.append(straight + noise[r])
    return jnp.stack(seeds)


def _kernel_backend() -> str:
    import os
    return os.environ.get("NEO_OBJ_BACKEND",
                          os.environ.get("NEO_LS_BACKEND", "pallas"))


def _lazy_bank() -> bool:
    """Lazy retry lanes (NEO_BANK=lazy, the default; =full reverts).

    The reference's ladder is lazy by construction: batch_plan returns the
    first feasible multi-start solve (expert_planner.py:161-165) and
    warm_start_plan returns immediately on carry success (:186-192) — the
    retry lanes only ever run after a failure. The parallel bank used to pay
    every lane every plan; with lazy banking the retry lanes are solved
    with a skip flag derived from the primary phase's acceptance, which the
    in-kernel solvers turn into whole-tile early exits. Selection is
    provably unchanged: a skipped lane is only skipped when the selector
    cannot pick it (a feasible primary shadows every retry lane)."""
    import os
    return os.environ.get("NEO_BANK", "lazy") == "lazy"


def make_plan_window(emap, head_state: jnp.ndarray, tail_state: jnp.ndarray,
                     pp: PlannerParams):
    """ESDF window around the local planning problem when the fused grid
    kernels are engaged (ESDF backend on TPU), else None.

    One window serves every lane/candidate of the solve: the receding-horizon
    target sits at most ~longitu_step_dis + escape from the plan start
    (traj_planner_node.py:450-488), so a kernel_window_cells-sized crop
    centered between head and tail covers the whole multi-start bank."""
    from neoplanner_tpu.mapping import scene as scene_map
    if (isinstance(emap, scene_map.SceneMap)
            or pp.sampling != "relative"
            or jax.default_backend() != "tpu"
            or _kernel_backend() == "xla"):
        return None
    from neoplanner_tpu.mapping import esdf as esdf_map
    center = (head_state[0] + tail_state[0]) / 2
    return esdf_map.make_window(emap, center, pp.kernel_window_cells)


def solve_one(emap: ESDFMap, head_state: jnp.ndarray, tail_state: jnp.ndarray,
              int_wpts0: jnp.ndarray, ts0: jnp.ndarray, pp: PlannerParams,
              window=None, skip=None) -> Trajectory:
    """One L-BFGS solve from one initialization (plan_once, expert_planner.py:205-237).

    head_state/tail_state: (s, D) boundary states (rows beyond those provided by the
    caller should be zero — matching read_planning_conditions, :170-184).
    window: optional (esdf, origin) crop from :func:`make_plan_window` —
    engages the fused grid kernels for the optimization-time objective.
    skip: optional 0/1 scalar — the lazy bank (see :func:`warm_start_plan`):
    a skipped problem returns its seed unsolved with iters=0 (the in-kernel
    solvers cluster skipped problems into tiles that exit before their first
    iteration; the XLA fallback solves and masks, preserving semantics).
    """
    x0 = costs_mod.pack(int_wpts0, minco.T_to_tau(ts0, pp.t_min, pp.t_max), pp)
    fun = partial(costs_mod.objective, head_state=head_state,
                  tail_state=tail_state, emap=emap, pp=pp)
    from neoplanner_tpu.mapping import scene as scene_map
    is_scene = isinstance(emap, scene_map.SceneMap)
    # On the TPU the fused Pallas kernels evaluate the objective: line-search
    # candidates via the forward-only kernel, the accept-point value_and_grad
    # via the fused analytic-adjoint kernel (plan/costs_pallas.py for the
    # analytic scene backend, plan/costs_pallas_grid.py for sensed ESDF
    # grids) — profiling showed the XLA evaluation chains dominate the solve
    # wall time. NEO_OBJ_BACKEND=xla keeps autodiff (A/B).
    ls_fun = None
    cost_pp = pp
    if (pp.sampling == "relative" and jax.default_backend() == "tpu"
            and _kernel_backend() != "xla" and is_scene):
        from neoplanner_tpu.plan import costs_pallas
        ls_fun = partial(costs_pallas.objective_fwd,
                         head_state=head_state, tail_state=tail_state,
                         scene=emap, pp=pp)
        fun = partial(costs_pallas.objective_vjp, head_state=head_state,
                      tail_state=tail_state, scene=emap, pp=pp)
    elif window is not None:
        from neoplanner_tpu.plan import costs_pallas_grid
        win_esdf, win_origin = window
        ls_fun = partial(costs_pallas_grid.objective_fwd_grid,
                         head_state=head_state, tail_state=tail_state,
                         win_esdf=win_esdf, win_origin=win_origin, pp=pp)
        fun = partial(costs_pallas_grid.objective_vjp_grid,
                      head_state=head_state, tail_state=tail_state,
                      win_esdf=win_esdf, win_origin=win_origin, pp=pp)
        # acceptance below re-evaluates against the FULL map (a window can
        # never accept what the map rejects); nearest-cell lookups are the
        # reference's own acceptance semantics (esdf.py:53-82) and avoid the
        # full-grid one-hot MXU temporaries at large batch
        import dataclasses
        cost_pp = dataclasses.replace(pp, esdf_interp="nearest")
    if pp.ls_mode == "auto":
        # wide (vmapped) line search only when the fused forward kernel absorbs
        # the widened candidate axis; the widened XLA objective is the round-1
        # OOM shape (batch x candidates x samples x primitives) at B=4096
        ls_parallel = ls_fun is not None
    else:
        ls_parallel = pp.ls_mode == "wide"
    import os
    if (ls_fun is not None
            and os.environ.get("NEO_SOLVER", "kernel") == "kernel"):
        # the WHOLE solve in one Pallas program: the XLA iteration loop pays
        # ~6-8 dispatches per L-BFGS iteration, which round-3 profiling
        # showed is the plan stage's binding constraint (plan/solve_pallas.py
        # for the scene backend, plan/solve_pallas_grid.py for sensed-grid
        # windows). NEO_SOLVER=xla reverts to the per-eval kernel loop.
        if is_scene:
            from neoplanner_tpu.plan import solve_pallas
            res_x, _, res_iters = solve_pallas.solve_scene(
                x0, head_state, tail_state, emap, pp, skip=skip)
        else:
            from neoplanner_tpu.plan import solve_pallas_grid
            res_x, _, res_iters = solve_pallas_grid.solve_grid(
                x0, head_state, tail_state, win_esdf, win_origin, pp,
                skip=skip)
    else:
        res = lbfgs.minimize(fun, x0, max_iters=pp.max_iters,
                             history=pp.history, max_ls=pp.max_ls,
                             ftol=1e-10, gtol=1e-8,
                             ls_parallel=ls_parallel, ls_fun=ls_fun)
        res_x, res_iters = res.x, res.iters
        if skip is not None:
            # XLA fallback pays the solve but reports lazy-bank semantics
            # (skipped = unsolved seed) so CPU tests cover the same contract
            keep = skip < 0.5
            res_x = jnp.where(keep, res_x, x0)
            res_iters = jnp.where(keep, res_iters, 0)
    q, tau = costs_mod.unpack(res_x, pp)
    ts = minco.tau_to_T(tau, pp.t_min, pp.t_max)
    cvec, coeffs = costs_mod.traj_costs(head_state, tail_state, q, ts, emap,
                                        cost_pp)
    ok = cvec[3] * pp.w_collision <= pp.collision_cost_tol
    return Trajectory(int_wpts=q, ts=ts, coeffs=coeffs, costs=cvec, ok=ok,
                      iters=res_iters)


def _select(bank: Trajectory, pp: PlannerParams) -> Trajectory:
    """Pick the accepted solution the reference's priority would pick.

    batch_plan keeps the cheapest feasible of the first batch_num seeds
    (expert_planner.py:161-165); only if none is feasible does it fall back to the
    retry ladder (:166-168). Infeasible-everywhere returns the least-colliding lane
    with ok=False (the caller's retry ladder then widens the local target, mirroring
    traj_planner_node.py:429-448).
    """
    w = costs_mod.weights(pp)
    total = jax.vmap(lambda c: jnp.dot(c, w))(bank.costs)         # (B,)
    primary = jnp.arange(total.shape[0]) < pp.batch_num

    INF = jnp.float32(jnp.inf)
    score_primary = jnp.where(bank.ok & primary, total, INF)
    score_retry = jnp.where(bank.ok, total, INF)
    any_primary = jnp.any(bank.ok & primary)
    any_ok = jnp.any(bank.ok)
    score_fallback = bank.costs[:, 3]                              # collision cost
    idx = jnp.where(any_primary, jnp.argmin(score_primary),
                    jnp.where(any_ok, jnp.argmin(score_retry),
                              jnp.argmin(score_fallback)))
    picked = jax.tree_util.tree_map(lambda leaf: leaf[idx], bank)
    return picked.replace(ok=any_ok, iters=jnp.sum(bank.iters))


def plan(emap: ESDFMap, head_state: jnp.ndarray, tail_state: jnp.ndarray,
         key: jnp.ndarray, pp: PlannerParams) -> Trajectory:
    """Full expert plan: parallel multi-start + retries, best-feasible selection.

    Equivalent coverage to MinJerkPlanner.plan → batch_plan → warm_start_plan
    (expert_planner.py:62-80, 142-168, 186-203) in one fixed-shape program.
    """
    seeds = seed_bank(head_state[0], tail_state[0], key, pp)       # (B, D, n)
    ts0 = init_ts(pp)
    window = make_plan_window(emap, head_state, tail_state, pp)
    if _lazy_bank() and seeds.shape[0] > pp.batch_num:
        # two-phase lazy bank: solve the batch_num primaries, then the
        # wide/noisy retry lanes with skip = "a primary accepted" — the
        # selector below reads retries only when no primary is feasible
        # (expert_planner.py:161-168), so skipping is selection-invariant
        prim = jax.vmap(lambda q0: solve_one(
            emap, head_state, tail_state, q0, ts0, pp, window=window)
        )(seeds[:pp.batch_num])
        skip = jnp.any(prim.ok).astype(jnp.float32)
        rest = jax.vmap(lambda q0: solve_one(
            emap, head_state, tail_state, q0, ts0, pp, window=window,
            skip=skip))(seeds[pp.batch_num:])
        bank = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b]), prim, rest)
    else:
        bank = jax.vmap(lambda q0: solve_one(emap, head_state, tail_state,
                                             q0, ts0, pp, window=window)
                        )(seeds)
    return _select(bank, pp)


def plan_with_carry(emap: ESDFMap, head_state: jnp.ndarray,
                    tail_state: jnp.ndarray, carry_wpts0: jnp.ndarray,
                    carry_ts0: jnp.ndarray, has_carry: jnp.ndarray,
                    key: jnp.ndarray, pp: PlannerParams) -> Trajectory:
    """The 'warmstart' planner's replan as ONE merged bank.

    Lane 0 holds the carried previous solution when one exists (else the
    straight seed, making this identical to :func:`plan`); the remaining lanes
    are the reference seeds + noisy retries. Selection gives the carry lane
    priority when feasible — warm_start_plan returns immediately on carry
    success (expert_planner.py:186-192) — then falls back to the expert
    priority. Round 2 ran a warm bank AND a cold :func:`plan` bank every
    segment and selected by has_carry afterward; in fixed-shape jitted code
    both always execute, so 'warmstart' cost ~2x an expert plan forever.
    """
    seeds = seed_bank(head_state[0], tail_state[0], key, pp)
    seeds = seeds.at[0].set(jnp.where(has_carry, carry_wpts0, seeds[0]))
    ts_bank = jnp.broadcast_to(init_ts(pp), (seeds.shape[0], pp.num_pieces))
    ts_bank = ts_bank.at[0].set(jnp.where(has_carry, carry_ts0, ts_bank[0]))
    window = make_plan_window(emap, head_state, tail_state, pp)
    if _lazy_bank() and seeds.shape[0] > 1:
        # lazy bank: a feasible CARRY shadows every other lane (the
        # use_carry override below) — skip them all. Without a carry the
        # full bank runs (plan() semantics need every primary's cost).
        first = solve_one(emap, head_state, tail_state, seeds[0], ts_bank[0],
                          pp, window=window)
        skip = (has_carry & first.ok).astype(jnp.float32)
        rest = jax.vmap(lambda q0, t0: solve_one(
            emap, head_state, tail_state, q0, t0, pp, window=window,
            skip=skip))(seeds[1:], ts_bank[1:])
        bank = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b]), first, rest)
    else:
        bank = jax.vmap(lambda q0, t0: solve_one(emap, head_state, tail_state,
                                                 q0, t0, pp, window=window)
                        )(seeds, ts_bank)
    sel = _select(bank, pp)
    use_carry = has_carry & bank.ok[0]
    picked = jax.tree_util.tree_map(
        lambda lanes, s: jnp.where(use_carry, lanes[0], s), bank, sel)
    return picked.replace(ok=sel.ok, iters=jnp.sum(bank.iters))


def warm_start_plan(emap: ESDFMap, head_state: jnp.ndarray, tail_state: jnp.ndarray,
                    int_wpts0: jnp.ndarray, ts0: jnp.ndarray, key: jnp.ndarray,
                    pp: PlannerParams) -> Trajectory:
    """Warm-started plan (given initialization first, noisy straight-line retries in
    parallel) — expert_planner.py:186-203 semantics with the retry loop vectorized.
    """
    retries = seed_bank(head_state[0], tail_state[0], key, pp)[pp.batch_num:]
    seeds = jnp.concatenate([int_wpts0[None], retries], axis=0)
    ts_bank = jnp.concatenate([ts0[None], jnp.broadcast_to(
        init_ts(pp), (retries.shape[0], pp.num_pieces))], axis=0)
    window = make_plan_window(emap, head_state, tail_state, pp)
    if _lazy_bank() and seeds.shape[0] > 1:
        # lazy bank (the NEO hot path): solve the warm-start lane first;
        # the retry lanes run only for problems where it was rejected —
        # the reference's warm_start_plan returns immediately on success
        # (expert_planner.py:186-192), and the priority select below reads
        # retries only when lane 0 failed, so skipping is selection-exact.
        first = solve_one(emap, head_state, tail_state, seeds[0], ts_bank[0],
                          pp, window=window)
        skip = first.ok.astype(jnp.float32)
        rest = jax.vmap(lambda q0, t0: solve_one(
            emap, head_state, tail_state, q0, t0, pp, window=window,
            skip=skip))(seeds[1:], ts_bank[1:])
        bank = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b]), first, rest)
    else:
        bank = jax.vmap(lambda q0, t0: solve_one(emap, head_state,
                                                 tail_state, q0,
                                                 t0, pp, window=window)
                        )(seeds, ts_bank)

    # priority: the warm-start lane if feasible, else cheapest feasible retry
    w = costs_mod.weights(pp)
    total = jax.vmap(lambda c: jnp.dot(c, w))(bank.costs)
    INF = jnp.float32(jnp.inf)
    any_ok = jnp.any(bank.ok)
    idx = jnp.where(bank.ok[0], 0,
                    jnp.where(any_ok, jnp.argmin(jnp.where(bank.ok, total, INF)),
                              jnp.argmin(bank.costs[:, 3])))
    picked = jax.tree_util.tree_map(lambda leaf: leaf[idx], bank)
    return picked.replace(ok=any_ok, iters=jnp.sum(bank.iters))


def adaptive_num_pieces(start_pos, target_pos, init_seg_len: float = 2.0
                        ) -> int:
    """The reference's 'adaptive' init mode piece count
    (generate_init_variables, expert_planner.py:87-88; init_seg_len default
    2.0 m, traj_planner_node.py:41): one intermediate waypoint per
    ~init_seg_len of straight-line distance, at least one."""
    import math

    import numpy as np

    dist = float(np.linalg.norm(np.asarray(target_pos) - np.asarray(start_pos)))
    return max(math.ceil(dist / init_seg_len - 1), 1) + 1


def plan_adaptive(emap, head_state: jnp.ndarray, tail_state: jnp.ndarray,
                  key: jnp.ndarray, pp: PlannerParams,
                  init_seg_len: float = 2.0) -> Trajectory:
    """Expert plan with the 'adaptive' waypoint count (init_wpts_mode
    switch, expert_planner.py:87-90). Shapes must be static under XLA, so M
    is chosen on the host from *concrete* boundary positions — each distinct
    M compiles once and is cached. Use from host-level flows (e.g. a single
    global plan to a far goal); the jitted closed loop pins M
    (planner_config.yaml:8-10, SURVEY §7 'Dynamic piece count')."""
    import dataclasses

    M = adaptive_num_pieces(head_state[0], tail_state[0], init_seg_len)
    return plan(emap, head_state, tail_state, key,
                dataclasses.replace(pp, num_pieces=M))


def pad_boundary_state(state_2rows: jnp.ndarray, pp: PlannerParams) -> jnp.ndarray:
    """(pos; vel) -> (s, D) boundary state with zero acc, as
    read_planning_conditions does for short inputs (expert_planner.py:175-181)."""
    out = jnp.zeros((pp.s, pp.dims))
    return out.at[:2].set(state_2rows[:, : pp.dims])
