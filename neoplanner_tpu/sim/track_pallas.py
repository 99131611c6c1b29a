"""The WHOLE tracking segment in one Pallas program (scene backend).

After the in-kernel L-BFGS solver (plan/solve_pallas.py) took the plan stage
to 134 ms at B=4096, the 60-substep tracking scan (sim/env._track_segment)
remained ~41 ms of XLA dispatch/HBM round-trips: each lax.scan iteration is
a handful of tiny fused kernels that read and write the full (B,) drone
state from HBM. This kernel runs the whole segment — cascaded controller +
semi-implicit integration (sim/dynamics.step), differential-flatness
attitude (core/frames.quat_from_accel_yaw), goal-reach check, the 10 Hz
closed-loop weighted metric with its analytic scene-SDF distance query
(traj_planner_node.py:333-363), and the tracking-error trace — in VMEM per
512-lane tile, one dispatch per segment.

Semantics mirror sim/env._track_segment exactly (golden test:
tests/test_track_pallas.py pins drone state, metrics, and trace against the
XLA scan). Both metric backends are served: the scene (analytic) form
queries the SDF in-kernel; the sensed-grid form (track_segment_grid) runs
the same kernel without a distance query and applies the collision metric
outside at the exported 10 Hz tick positions — exact, since the map query
never feeds back into the dynamics. NEO_TRACKER=xla reverts.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neoplanner_tpu.config import MissionParams, PlannerParams, SimParams
from neoplanner_tpu.core.types import DroneState
from neoplanner_tpu.plan.costs_pallas import _NB, _scene_min_dist, pack_prims

_METRIC_EVERY = 6  # 60 Hz cmd / 10 Hz metric (sim/env.METRIC_EVERY)


def enabled() -> bool:
    return (_os.environ.get("NEO_TRACKER", "kernel") == "kernel"
            and jax.default_backend() == "tpu")


def _quat_from_accel_yaw_rows(ax, ay, az, yaw, g):
    """frames.quat_from_accel_yaw on (NB,) component rows, branch-free."""
    tx, ty, tz = ax, ay, az + g
    tn = jnp.sqrt(tx * tx + ty * ty + tz * tz) + 1e-9
    zbx, zby, zbz = tx / tn, ty / tn, tz / tn
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    # yb = normalize(cross(zb, xc)), xc = [cy, sy, 0]
    ybx = -zbz * sy
    yby = zbz * cy
    ybz = zbx * sy - zby * cy
    yn = jnp.sqrt(ybx * ybx + yby * yby + ybz * ybz) + 1e-9
    ybx, yby, ybz = ybx / yn, yby / yn, ybz / yn
    # xb = cross(yb, zb)
    xbx = yby * zbz - ybz * zby
    xby = ybz * zbx - ybx * zbz
    xbz = ybx * zby - yby * zbx
    # rot columns are body axes: m[:, 0] = xb, m[:, 1] = yb, m[:, 2] = zb
    m00, m01, m02 = xbx, ybx, zbx
    m10, m11, m12 = xby, yby, zby
    m20, m21, m22 = xbz, ybz, zbz
    # frames.matrix_to_quat: four candidates, argmax-pivot select (ties ->
    # earliest candidate, matching jnp.argmax)
    tr = m00 + m11 + m22
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    c0 = (qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw),
          (m10 - m01) / (4 * qw))
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    c1 = ((m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx),
          (m02 + m20) / (4 * qx))
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    c2 = ((m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy,
          (m12 + m21) / (4 * qy))
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    c3 = ((m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz),
          (m12 + m21) / (4 * qz), qz)
    p0, p1 = tr, m00 - m11 - m22
    p2, p3 = -m00 + m11 - m22, -m00 - m11 + m22
    a01 = p0 >= p1
    b01 = tuple(jnp.where(a01, x, y) for x, y in zip(c0, c1))
    pa = jnp.maximum(p0, p1)
    a23 = p2 >= p3
    b23 = tuple(jnp.where(a23, x, y) for x, y in zip(c2, c3))
    pb = jnp.maximum(p2, p3)
    q = tuple(jnp.where(pa >= pb, x, y) for x, y in zip(b01, b23))
    qn = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2]
                  + q[3] * q[3]) + 1e-12
    return tuple(x / qn for x in q)


def _make_track_kernel(spr, i0, n_prims, params, with_dis=True):
    """with_dis=False (grid metric backend) skips the in-kernel analytic
    distance query: the collision metric term is applied OUTSIDE the kernel
    by sampling the per-env ESDF at the 10 Hz tick positions (exported via
    trace row 15's tick mask) — exact, because the map query never feeds
    back into the dynamics."""
    (dt, kp_pos, kp_vel, a_max, drag, yaw_rate_max, g, des_pos_z,
     v_max, safe_dis, reach_thr) = params

    def kernel(cmd_ref, st_ref, prims_ref, out_ref, trace_ref):
        # Read state ROWS straight off the ref — never materialize the
        # (22, NB) value and slice rows out of it. Carries initialized
        # from 1-D slices of a materialized rank-2 value crash the Mosaic
        # layout pass (layout.h arr.size() >= layout_rank, bisected round
        # 4, /tmp/ablate3.py bigA-vs-bigB); direct ref row reads lower
        # cleanly.
        st = st_ref

        def body(t, carry):
            (px, py, pz, vx, vy, vz, yaw, qw, qx, qy, qz,
             mpx, mpy, m0, m1, m2, reached, steps) = carry
            active = st[20]
            moving = st[21]
            c = cmd_ref[pl.ds(t * 8, 8), :]          # (8, NB)
            pdx, pdy = c[0], c[1]
            vdx, vdy = c[2], c[3]
            adx, ady = c[4], c[5]
            pdz = jnp.full_like(pdx, des_pos_z)

            # rows 6/7 carry the desired yaw and its speed>0.05 validity,
            # precomputed OUTSIDE the kernel from the commands (jax 0.9's
            # Mosaic lowering has no atan2; the desired yaw depends only on
            # the input setpoints, so hoisting it is exact)
            yaw_des = jnp.where(c[7] > 0.5, c[6], yaw)

            acx = adx + kp_pos * (pdx - px) + kp_vel * (vdx - vx)
            acy = ady + kp_pos * (pdy - py) + kp_vel * (vdy - vy)
            acz = kp_pos * (pdz - pz) + kp_vel * (0.0 - vz)
            an = jnp.sqrt(acx * acx + acy * acy + acz * acz)
            sc = jnp.minimum(1.0, a_max / jnp.maximum(an, 1e-9))
            acx, acy, acz = acx * sc, acy * sc, acz * sc

            nvx = vx + (acx - drag * vx) * dt
            nvy = vy + (acy - drag * vy) * dt
            nvz = vz + (acz - drag * vz) * dt
            npx = px + nvx * dt
            npy = py + nvy * dt
            npz = pz + nvz * dt

            # wrap into [-pi, pi] without atan2 (no Mosaic lowering): the
            # XLA scan's atan2(sin, cos) equals dy - 2pi*round(dy/2pi) to
            # f32 roundoff for the |dy| < 2pi + lim range yaw can reach.
            # round is floor(x+0.5) — jnp.round's round_p has no working
            # Mosaic lowering on 1-D vectors (layout.h check failure,
            # bisected round 4); ties differ only at measure-zero points
            # the clip below absorbs.
            dy_ = yaw_des - yaw
            two_pi = 6.283185307179586
            dyaw = dy_ - two_pi * jnp.floor(dy_ / two_pi + 0.5)
            lim = yaw_rate_max * dt
            nyaw = yaw + jnp.clip(dyaw, -lim, lim)
            nq = _quat_from_accel_yaw_rows(acx, acy, acz, nyaw, g)

            # f32-mask max, NOT (reached > 0.5) | (moving < 0.5): `|` of
            # 1-D mask vectors with a loop-invariant operand crashes the
            # Mosaic layout pass (layout.h arr.size() >= layout_rank check;
            # bisected round 4, /tmp/ablate3.py — `&` is unaffected)
            frz = jnp.maximum(reached, 1.0 - moving) > 0.5

            def keep(old, new):
                return jnp.where(frz, old, new)

            px, py, pz = keep(px, npx), keep(py, npy), keep(pz, npz)
            vx, vy, vz = keep(vx, nvx), keep(vy, nvy), keep(vz, nvz)
            yaw = keep(yaw, nyaw)
            qw, qx, qy, qz = (keep(qw, nq[0]), keep(qx, nq[1]),
                              keep(qy, nq[2]), keep(qz, nq[3]))

            gdx, gdy = px - st[11], py - st[12]
            close = jnp.sqrt(gdx * gdx + gdy * gdy) < reach_thr
            reached = jnp.maximum(
                reached, jnp.where((active > 0.5) & close, 1.0, 0.0))

            tick = (jnp.mod(t + i0, _METRIC_EVERY) == 0) \
                & (active > 0.5) & (reached < 0.5)
            ddx, ddy = px - mpx, py - mpy
            d_dist = jnp.sqrt(ddx * ddx + ddy * ddy)
            vviol = jnp.maximum(vx * vx + vy * vy - v_max * v_max, 0.0)
            tickf = jnp.where(tick, 1.0, 0.0)
            if with_dis:
                # lowp=False: the closed-loop metric stays f32-exact even
                # when NEO_SCENE_PRECISION=bf16 relaxes the *planner* SDF
                dis = _scene_min_dist(prims_ref, n_prims, px[None, :],
                                      py[None, :], False, lowp=False)[0]
                dviol = jnp.maximum(safe_dis - jnp.maximum(dis, 0.0), 0.0)
                m2 = m2 + tickf * dviol * dviol * dviol
            m0 = m0 + tickf * d_dist
            m1 = m1 + tickf * vviol * vviol * vviol
            mpx = jnp.where(tick, px, mpx)
            mpy = jnp.where(tick, py, mpy)
            steps = steps + jnp.where((active > 0.5) & (reached < 0.5),
                                      1.0, 0.0)

            zero = jnp.zeros_like(px)
            trace_ref[pl.ds(t * 16, 16), :] = jnp.stack(
                [px, py, pz, vx, vy, vz, pdx, pdy, pdz, vdx, vdy, zero,
                 adx, ady, zero, tickf])
            return (px, py, pz, vx, vy, vz, yaw, qw, qx, qy, qz,
                    mpx, mpy, m0, m1, m2, reached, steps)

        init = (st[0], st[1], st[2], st[3], st[4], st[5], st[6],
                st[7], st[8], st[9], st[10], st[13], st[14],
                st[15], st[16], st[17], st[18], st[19])
        out = jax.lax.fori_loop(0, spr, body, init)
        out_ref[...] = jnp.stack(out)

    return kernel


def _pad_lanes(a, np_):
    pad = np_ - a.shape[0]
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return a


def _track_batch(cmds, st, prims, spr, i0, params, interpret,
                 with_dis=True):
    N = st.shape[0]
    n_prims = prims.shape[1]
    np_ = N + ((-N) % _NB)
    c6 = cmds.reshape(N, spr, 6)
    # rows 6/7: desired yaw (atan2 has no Mosaic lowering — precompute from
    # the commands, exactly as the XLA scan does) and its speed>0.05 flag
    vdx, vdy = c6[..., 2], c6[..., 3]
    speed = jnp.sqrt(vdx * vdx + vdy * vdy)
    yd = jnp.arctan2(vdy, vdx)
    hasd = jnp.where(speed > 0.05, 1.0, 0.0).astype(cmds.dtype)
    cmd8 = jnp.concatenate(
        [c6, yd[..., None].astype(cmds.dtype), hasd[..., None]], axis=-1)
    cmd_t = _pad_lanes(cmd8.reshape(N, spr * 8), np_).T.astype(jnp.float32)
    st_t = _pad_lanes(st, np_).T.astype(jnp.float32)
    prims_t = _pad_lanes(prims.reshape(N, n_prims * 6),
                         np_).T.astype(jnp.float32)
    kernel = _make_track_kernel(spr, i0, n_prims, params, with_dis)
    spec = lambda rows: pl.BlockSpec((rows, _NB), lambda i: (0, i),  # noqa: E731
                                     memory_space=pltpu.VMEM)
    out, trace = pl.pallas_call(
        kernel,
        grid=(np_ // _NB,),
        in_specs=[spec(spr * 8), spec(22), spec(n_prims * 6)],
        out_specs=(spec(18), spec(spr * 16)),
        out_shape=(jax.ShapeDtypeStruct((18, np_), jnp.float32),
                   jax.ShapeDtypeStruct((spr * 16, np_), jnp.float32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=spr * (150 + n_prims * 15) * np_,
            bytes_accessed=(spr * 8 + 22 + n_prims * 6 + 20
                            + spr * 16) * 4 * np_,
            transcendentals=spr * 8 * np_),
    )(cmd_t, st_t, prims_t)
    return out.T[:N], trace.T[:N].reshape(N, spr, 16)


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
def _flat_tracker(spr, i0, n_prims, params, interpret, with_dis=True):
    @jax.custom_batching.custom_vmap
    def track_flat(cmds, st, prims):
        return _track_batch(cmds, st, prims, spr, i0, params, interpret,
                            with_dis)

    track_flat.def_vmap(_collapse_rule(track_flat))
    return track_flat


def track_segment(state, track_cmds: jnp.ndarray, pp: PlannerParams,
                  mp: MissionParams, sp: SimParams, i0: int = 0,
                  interpret: bool = False):
    """One tracking segment for a single env, entirely in-kernel.

    Drop-in for sim/env._track_segment on the scene (analytic) metric
    backend: returns (drone, reached, steps, metrics, metric_pos,
    trace (spr, 5, 3)). Vmappable (custom_vmap collapse)."""
    spr = track_cmds.shape[0]
    params = (sp.dt, sp.kp_pos, sp.kp_vel, sp.a_max, sp.drag,
              sp.yaw_rate_max, sp.g, mp.des_pos_z, pp.v_max, pp.safe_dis,
              mp.target_reach_threshold)
    prims = pack_prims(state.scene)
    st = _pack_state(state)
    fn = _flat_tracker(spr, i0, prims.shape[0], params, interpret)
    out, trace = fn(track_cmds.reshape(spr, 6)[None], st[None], prims[None])
    out, trace = out[0], trace[0]
    # output rows mirror the kernel carry order: pos3 vel3 yaw quat4
    # metric_pos2 metrics3 reached steps
    drone = DroneState(pos=out[0:3], vel=out[3:6], quat=out[7:11],
                       yaw=out[6])
    return (drone, out[16] > 0.5, out[17].astype(jnp.int32), out[13:16],
            out[11:13], trace[:, :15].reshape(spr, 5, 3))


def _pack_state(state):
    from neoplanner_tpu.sim import missions
    active = state.phase == missions.PHASE_MISSION
    moving = active | (state.phase == missions.PHASE_TAKEOFF)
    return jnp.concatenate([
        state.drone.pos, state.drone.vel, state.drone.yaw[None],
        state.drone.quat, state.goal, state.metric_pos, state.metrics,
        jnp.stack([state.reached.astype(jnp.float32),
                   state.steps.astype(jnp.float32),
                   active.astype(jnp.float32),
                   moving.astype(jnp.float32)])])


def track_segment_grid(state, track_cmds: jnp.ndarray, pp: PlannerParams,
                       mp: MissionParams, sp: SimParams, i0: int = 0,
                       interpret: bool = False):
    """track_segment for the sensed-grid metric backend.

    The kernel runs the dynamics/metric loop without a distance query and
    exports the 10 Hz tick mask (trace row 15); the collision term is then
    applied outside by nearest-sampling the per-env ESDF at the (statically
    indexed) tick substeps' positions — the same query the XLA scan makes
    (sim/env.py metric tick; mapping/query.distance nearest mode), so the
    result is exact, not an approximation."""
    from neoplanner_tpu.mapping import esdf as esdf_map
    spr = track_cmds.shape[0]
    params = (sp.dt, sp.kp_pos, sp.kp_vel, sp.a_max, sp.drag,
              sp.yaw_rate_max, sp.g, mp.des_pos_z, pp.v_max, pp.safe_dis,
              mp.target_reach_threshold)
    st = _pack_state(state)
    prims = jnp.zeros((1, 6), jnp.float32)                 # unused lane
    fn = _flat_tracker(spr, i0, 1, params, interpret, with_dis=False)
    out, trace = fn(track_cmds.reshape(spr, 6)[None], st[None], prims[None])
    out, trace = out[0], trace[0]

    # collision metric at the statically-known tick substeps
    t_ticks = [t for t in range(spr) if (t + i0) % _METRIC_EVERY == 0]
    rows = trace[jnp.asarray(t_ticks)]                     # (T, 16)
    dis, _ = esdf_map.sample(state.emap, rows[:, :2], mode="nearest")
    dviol = jnp.maximum(pp.safe_dis - jnp.maximum(dis, 0.0), 0.0)
    m2_extra = jnp.sum(rows[:, 15] * dviol ** 3)
    metrics = out[13:16] + jnp.array([0.0, 0.0, 1.0]) * m2_extra

    drone = DroneState(pos=out[0:3], vel=out[3:6], quat=out[7:11],
                       yaw=out[6])
    return (drone, out[16] > 0.5, out[17].astype(jnp.int32), metrics,
            out[11:13], trace[:, :15].reshape(spr, 5, 3))
