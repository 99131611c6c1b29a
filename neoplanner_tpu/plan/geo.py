"""Geometric-initialization planner: grid search -> pruned waypoints -> refine.

Re-design of the reference's GeoPlanner + AstarPlanner
(/root/reference/src/planner/scripts/traj_planner/geo_planner.py:12-101,
astar_planner.py:6-160), one of the paper's baselines. Two interchangeable
front-ends produce the geometric path:

- ``astar`` — host-side A* (numpy + heapq) with the reference's 8-connected
  motion model, 10 m map expansion, and ESDF collision predicate. Exact parity
  path for single plans and tests.
- ``wavefront_field`` / ``descend_path`` — the TPU-idiomatic equivalent: a
  cost-to-go field by iterated min-plus stencil relaxation (8-connected, exact
  up to the iteration budget) and a greedy fixed-step descent. Fully batched and
  jittable; this is what batched geo planning uses.

Both feed the reference's pruning rule (keep exactly 2 interior waypoints,
geo_planner.py:55-101) and then the expert's warm-start refinement.
"""

from __future__ import annotations

import heapq
import math
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from neoplanner_tpu.config import PlannerParams
from neoplanner_tpu.core.types import ESDFMap, Trajectory
from neoplanner_tpu.mapping import esdf as esdf_map
from neoplanner_tpu.plan import expert

_SQRT2 = math.sqrt(2.0)
# 8-connected motion model (astar_planner.py:105-116)
_MOVES = [(1, 0, 1.0), (0, 1, 1.0), (-1, 0, 1.0), (0, -1, 1.0),
          (-1, -1, _SQRT2), (-1, 1, _SQRT2), (1, -1, _SQRT2), (1, 1, _SQRT2)]
_EXPAND_M = 10.0  # map expansion radius (astar_planner.py:38)


def astar(esdf_grid: np.ndarray, origin, resolution: float, start, goal,
          safe_dis: float = 0.5) -> List[List[float]]:
    """Host A* over the ESDF grid. Returns [[x, y], ...] world coordinates from
    start to goal (inclusive); empty list when unreachable.

    Matches the reference's semantics: the grid is virtually expanded by 10 m on
    each side (out-of-expanded-map is invalid, out-of-*data* is free because the
    ESDF lookup returns 10000 there — esdf.py:66), collision = ESDF < safe_dis.
    """
    h, w = esdf_grid.shape
    pad = int(_EXPAND_M / resolution)
    ox = origin[0] - _EXPAND_M / 2
    oy = origin[1] - _EXPAND_M / 2
    W = w + pad
    H = h + pad

    def to_idx(p):
        return int((p[0] - ox) / resolution), int((p[1] - oy) / resolution)

    def to_world(ix, iy):
        return [ox + ix * resolution, oy + iy * resolution]

    def blocked(ix, iy):
        # back to data-grid indices (pad/2 cells of expansion on each side)
        col = ix - pad // 2
        row = iy - pad // 2
        if row < 0 or row >= h or col < 0 or col >= w:
            return False  # outside the data grid: free (esdf -> 10000)
        return esdf_grid[row, col] < safe_dis

    sx, sy = to_idx(start)
    gx, gy = to_idx(goal)
    open_heap = [(0.0, 0.0, (sx, sy))]
    g_cost = {(sx, sy): 0.0}
    parent = {}
    found = False
    while open_heap:
        _, g, (cx, cy) = heapq.heappop(open_heap)
        if g > g_cost.get((cx, cy), np.inf):
            continue
        if (cx, cy) == (gx, gy):
            found = True
            break
        for dx, dy, cost in _MOVES:
            nx, ny = cx + dx, cy + dy
            if nx < 0 or nx >= W or ny < 0 or ny >= H or blocked(nx, ny):
                continue
            ng = g + cost
            if ng < g_cost.get((nx, ny), np.inf):
                g_cost[(nx, ny)] = ng
                parent[(nx, ny)] = (cx, cy)
                f = ng + math.hypot(nx - gx, ny - gy)
                heapq.heappush(open_heap, (f, ng, (nx, ny)))
    if not found:
        return []
    path = [to_world(gx, gy)]
    node = (gx, gy)
    while node in parent:
        node = parent[node]
        path.append(to_world(*node))
    return path[::-1]


def seg_feasible(esdf_grid, origin, resolution, head, tail,
                 clearance: float = 0.4) -> bool:
    """Straight-segment feasibility every 0.1 m vs clearance
    (geo_planner.py:37-53)."""
    steps = int(math.ceil(max(abs(tail[0] - head[0]),
                              abs(tail[1] - head[1])) / 0.1)) + 1
    h, w = esdf_grid.shape
    for i in range(steps):
        t = i / max(steps - 1, 1)
        x = head[0] + t * (tail[0] - head[0])
        y = head[1] + t * (tail[1] - head[1])
        col = int((x - origin[0]) / resolution)
        row = int((y - origin[1]) / resolution)
        d = esdf_grid[row, col] if 0 <= row < h and 0 <= col < w else 1e4
        if d < clearance:
            return False
    return True


def prune_path(esdf_grid, origin, resolution, path: Sequence[Sequence[float]]
               ) -> List[Sequence[float]]:
    """Reduce the path to 4 key nodes = start + 2 interior + end
    (geo_planner.py:55-101 semantics)."""
    key_index = [0]
    head_i, tail_i = 0, 1
    while tail_i < len(path):
        while (seg_feasible(esdf_grid, origin, resolution, path[head_i],
                            path[tail_i]) or tail_i - head_i == 1):
            tail_i += 1
            if tail_i == len(path):
                break
        key_index.append(tail_i - 1)
        head_i = tail_i - 1

    n = len(key_index)
    if n == 2:
        final = np.linspace(key_index[0], key_index[-1], 4).astype(int).tolist()
    elif n == 3:
        if key_index[1] - key_index[0] > key_index[2] - key_index[1]:
            final = [key_index[0], (key_index[0] + key_index[1]) // 2,
                     key_index[1], key_index[2]]
        else:
            final = [key_index[0], key_index[1],
                     (key_index[1] + key_index[2]) // 2, key_index[2]]
    elif n == 4:
        final = key_index
    else:
        anchor_l = key_index[-1] / 3
        anchor_r = 2 * key_index[-1] / 3
        left = min(key_index, key=lambda x: abs(x - anchor_l))
        right = min(key_index, key=lambda x: abs(x - anchor_r))
        final = [key_index[0], left, right, key_index[-1]]
    return [path[i] for i in final]


def geo_plan(emap: ESDFMap, head_state: jnp.ndarray, tail_state: jnp.ndarray,
             key: jnp.ndarray, pp: PlannerParams) -> Trajectory:
    """Host A* + prune -> device warm-start refine (geo_traj_plan,
    geo_planner.py:19-35). Not jittable (host search); use the wavefront variant
    for batched use."""
    grid = np.asarray(emap.esdf.astype(jnp.float32))
    origin = np.asarray(emap.origin)
    res = float(emap.resolution)
    start = np.asarray(head_state[0])
    goal = np.asarray(tail_state[0])
    path = astar(grid, origin, res, start, goal, safe_dis=pp.safe_dis)
    if len(path) < 2:
        return expert.plan(emap, head_state, tail_state, key, pp)
    pruned = prune_path(grid, origin, res, path)
    q0 = jnp.array(np.array(pruned[1:1 + pp.num_wpts], dtype=np.float32).T)
    return expert.warm_start_plan(emap, head_state, tail_state, q0,
                                  expert.init_ts(pp), key, pp)


# ---------------------------------------------------------------------------
# device wavefront variant (batched/jittable)
# ---------------------------------------------------------------------------

def wavefront_field(emap: ESDFMap, goal: jnp.ndarray, safe_dis: float,
                    num_iters: int) -> jnp.ndarray:
    """Cost-to-go (in cells) to `goal` by iterated 8-neighbor min-plus
    relaxation. Exact once num_iters >= longest shortest-path length."""
    H, W = emap.esdf.shape
    blocked = emap.esdf < safe_dis
    INF = jnp.float32(1e9)
    col = ((goal[0] - emap.origin[0]) / emap.resolution).astype(jnp.int32)
    row = ((goal[1] - emap.origin[1]) / emap.resolution).astype(jnp.int32)
    row = jnp.clip(row, 0, H - 1)
    col = jnp.clip(col, 0, W - 1)
    d0 = jnp.full((H, W), INF).at[row, col].set(0.0)
    d0 = jnp.where(blocked, INF, d0)

    shifts = [(1, 0, 1.0), (-1, 0, 1.0), (0, 1, 1.0), (0, -1, 1.0),
              (1, 1, _SQRT2), (1, -1, _SQRT2), (-1, 1, _SQRT2), (-1, -1, _SQRT2)]

    def relax(d, _):
        best = d
        for dy, dx, c in shifts:
            # shift with INF padding (jnp.roll wraps; mask the wrapped border)
            s = jnp.roll(d, (dy, dx), axis=(0, 1)) + c
            if dy > 0:
                s = s.at[:dy, :].set(INF)
            elif dy < 0:
                s = s.at[dy:, :].set(INF)
            if dx > 0:
                s = s.at[:, :dx].set(INF)
            elif dx < 0:
                s = s.at[:, dx:].set(INF)
            best = jnp.minimum(best, s)
        best = jnp.where(blocked, INF, best)
        return best, None

    d, _ = jax.lax.scan(relax, d0, None, length=num_iters)
    return d


def descend_path(emap: ESDFMap, field: jnp.ndarray, start: jnp.ndarray,
                 num_steps: int) -> jnp.ndarray:
    """Greedy 8-neighbor descent of the cost-to-go field from `start`:
    (num_steps, 2) world points (holds position once at the minimum)."""
    H, W = field.shape
    col0 = jnp.clip(((start[0] - emap.origin[0]) / emap.resolution
                     ).astype(jnp.int32), 0, W - 1)
    row0 = jnp.clip(((start[1] - emap.origin[1]) / emap.resolution
                     ).astype(jnp.int32), 0, H - 1)

    neigh = jnp.array([(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
                       (1, 1), (1, -1), (-1, 1), (-1, -1)], jnp.int32)

    def step(carry, _):
        r, c = carry
        rr = jnp.clip(r + neigh[:, 0], 0, H - 1)
        cc = jnp.clip(c + neigh[:, 1], 0, W - 1)
        vals = field[rr, cc]
        k = jnp.argmin(vals)
        r2, c2 = rr[k], cc[k]
        x = emap.origin[0] + (c2.astype(jnp.float32) + 0.5) * emap.resolution
        y = emap.origin[1] + (r2.astype(jnp.float32) + 0.5) * emap.resolution
        return (r2, c2), jnp.stack([x, y])

    _, pts = jax.lax.scan(step, (row0, col0), None, length=num_steps)
    return pts


_PRUNE_CLEARANCE = 0.4   # geo_planner.py:41 OBS_CLEARANCE
_MAX_KEYS = 8            # static capacity of recorded key nodes
_FEAS_SAMPLES = 96       # fixed-count sampling of the 0.1 m feasibility walk


def _seg_feasible_device(emap: ESDFMap, a: jnp.ndarray, b: jnp.ndarray,
                         clearance: float) -> jnp.ndarray:
    """Straight-segment feasibility (geo_planner.py:37-53) with a static sample
    count instead of the reference's 0.1 m stride (shapes must be static)."""
    fr = jnp.linspace(0.0, 1.0, _FEAS_SAMPLES)
    pts = a[None, :] + fr[:, None] * (b - a)[None, :]
    dis, _ = esdf_map.sample_nearest(emap, pts)
    return jnp.all(dis >= clearance)


def prune_path_device(emap: ESDFMap, pts: jnp.ndarray, end: jnp.ndarray):
    """The reference's pruning rule (geo_planner.py:55-101) as a masked scan.

    pts: (N, 2) descent path; end: () int32 index of the path's last live point
    (the greedy descent holds position at the field minimum — points beyond
    ``end`` are duplicates and must not attract waypoints, the round-1 bug for
    goals closer than the descent length).

    Returns (i1, i2): indices into pts of the 2 interior key waypoints.
    """
    N = pts.shape[0]

    # greedy feasibility walk: extend tail while the straight segment from the
    # current head stays clear; on the first blocked tail, record tail-1 and
    # restart from it (geo_planner.py:60-76)
    def body(carry, i):
        head, keys, nk = carry
        live = (i <= end)
        feas = _seg_feasible_device(emap, pts[head], pts[i], _PRUNE_CLEARANCE) \
            | (i - head == 1)
        record = (~feas) & live
        store = record & (nk < _MAX_KEYS)
        keys = jnp.where(store, keys.at[jnp.minimum(nk, _MAX_KEYS - 1)
                                        ].set(i - 1), keys)
        nk = nk + store.astype(jnp.int32)
        head = jnp.where(record, i - 1, head)
        return (head, keys, nk), None

    keys0 = jnp.zeros((_MAX_KEYS,), jnp.int32)
    (_, keys, nk), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.int32), keys0, jnp.zeros((), jnp.int32)),
        jnp.arange(1, N))

    # full key list = [0, recorded..., end]; n = nk + 2 entries
    n = nk + 2
    endf = end.astype(jnp.float32)
    k1, k2 = keys[0], keys[1]

    # n == 2: evenly spaced thirds of the (straight-feasible) path (:81-83)
    i1_2 = jnp.round(endf / 3.0).astype(jnp.int32)
    i2_2 = jnp.round(2.0 * endf / 3.0).astype(jnp.int32)
    # n == 3: split the longer of the two segments around the single key (:84-90)
    left_longer = k1 > (end - k1)
    i1_3 = jnp.where(left_longer, k1 // 2, k1)
    i2_3 = jnp.where(left_longer, k1, (k1 + end) // 2)
    # n == 4: the two recorded keys verbatim (:91-93)
    i1_4, i2_4 = k1, k2
    # n > 4: keys closest to the 1/3 and 2/3 anchors (:94-99); 0 and end are
    # legal candidates in the reference's min() over key_index
    valid = jnp.arange(_MAX_KEYS) < nk
    cand = jnp.concatenate([jnp.zeros((1,), jnp.int32), keys,
                            end[None].astype(jnp.int32)])
    cand_valid = jnp.concatenate([jnp.ones((1,), bool), valid,
                                  jnp.ones((1,), bool)])
    candf = cand.astype(jnp.float32)
    gap_l = jnp.where(cand_valid, jnp.abs(candf - endf / 3.0), jnp.inf)
    gap_r = jnp.where(cand_valid, jnp.abs(candf - 2.0 * endf / 3.0), jnp.inf)
    i1_m = cand[jnp.argmin(gap_l)]
    i2_m = cand[jnp.argmin(gap_r)]

    i1 = jnp.where(n == 2, i1_2,
                   jnp.where(n == 3, i1_3, jnp.where(n == 4, i1_4, i1_m)))
    i2 = jnp.where(n == 2, i2_2,
                   jnp.where(n == 3, i2_3, jnp.where(n == 4, i2_4, i2_m)))
    return i1, i2


def geo_plan_device(emap: ESDFMap, head_state: jnp.ndarray,
                    tail_state: jnp.ndarray, key: jnp.ndarray,
                    pp: PlannerParams, num_iters: int = 256,
                    num_steps: int = 192) -> Trajectory:
    """Fully on-device geo plan: wavefront field -> greedy descent -> the
    reference's feasible-segment pruning (prune_path_device) -> warm-start
    refine. Batched via vmap."""
    field = wavefront_field(emap, tail_state[0], pp.safe_dis, num_iters)
    pts = descend_path(emap, field, head_state[0], num_steps)
    # live path length: first index that already sits at the held minimum
    at_min = jnp.all(pts == pts[-1], axis=1)
    end = jnp.argmax(at_min).astype(jnp.int32)
    end = jnp.where(at_min[0], jnp.zeros((), jnp.int32), end)
    i1, i2 = prune_path_device(emap, pts, end)
    q0 = jnp.stack([pts[i1], pts[i2]], axis=-1)
    return expert.warm_start_plan(emap, head_state, tail_state, q0,
                                  expert.init_ts(pp), key, pp)
