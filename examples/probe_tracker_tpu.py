"""On-chip validation of the in-kernel tracker (sim/track_pallas.py).

Compiles the Mosaic kernel on the TPU (interpret=False) and compares drone
state / metrics / trace against the XLA scan, for both metric backends —
the same comparison tests/test_track_pallas.py runs in interpret mode.
Exists because interpret-green kernels can still crash the remote Mosaic
compiler (CLAUDE.md rules 14/16/17; the round-4 layout.h bisect).
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
import jax.numpy as jnp

from neoplanner_tpu.config import (MapParams, MissionParams, PlannerParams,
                                   SimParams, WorldParams)
from neoplanner_tpu.sim import env, track_pallas
from neoplanner_tpu.world import scenegen

MAPP = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
PP, MP, SP = PlannerParams(), MissionParams(), SimParams()


def states_scene(n=4, goal=(20.0, 0.0)):
    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), n,
                                     WorldParams(num_boxes=8))
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    return jax.vmap(lambda k, w: env.reset(
        k, w, jnp.array(goal), PP, MP, MAPP, plan_map="scene"))(keys, worlds)


def cmds(n, spr=60):
    t = jnp.arange(spr) / MP.cmd_hz
    def one(i):
        v, a, w = 0.8 + 0.05 * i, 0.4, 2.0 + 0.3 * i
        px, py = v * t, a * jnp.sin(w * t)
        vx, vy = jnp.full_like(t, v), a * w * jnp.cos(w * t)
        ax, ay = jnp.zeros_like(t), -a * w * w * jnp.sin(w * t)
        return jnp.stack([jnp.stack([px, py], -1), jnp.stack([vx, vy], -1),
                          jnp.stack([ax, ay], -1)], axis=1)
    return jnp.stack([one(i) for i in range(n)])


def check(name, want, got, tol=1e-4):
    wd, wreach, wsteps, wmet, wmpos, wtrace = want
    gd, greach, gsteps, gmet, gmpos, gtrace = got
    errs = {
        "pos": float(jnp.abs(gd.pos - wd.pos).max()),
        "vel": float(jnp.abs(gd.vel - wd.vel).max()),
        "quat": float(jnp.abs(gd.quat - wd.quat).max()),
        "met": float(jnp.abs(gmet - wmet).max()),
        "trace": float(jnp.abs(gtrace - wtrace).max()),
    }
    ok = (all(v < tol for v in errs.values())
          and bool(jnp.array_equal(greach, wreach))
          and bool(jnp.array_equal(gsteps, wsteps)))
    print(f"{name}: {'OK' if ok else 'MISMATCH'} {errs}", flush=True)
    return ok


def main():
    import time
    st = states_scene()
    c = cmds(4)
    t0 = time.time()
    got = jax.vmap(lambda s, cc: track_pallas.track_segment(
        s, cc, PP, MP, SP))(st, c)
    jax.tree.map(lambda x: np.asarray(x), got)
    print(f"scene kernel compiled+ran {time.time()-t0:.1f}s", flush=True)
    want = jax.vmap(lambda s, cc: env._track_segment(
        s, cc, PP, MP, SP, "scene"))(st, c)
    jax.tree.map(lambda x: np.asarray(x), want)
    ok1 = check("scene", want, got)

    # grid variant: ground-truth grid states parked near an obstacle so the
    # collision term fires (tests/test_track_pallas.py pattern)
    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), 4,
                                     WorldParams(num_boxes=8))
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    stg = jax.vmap(lambda k, w: env.reset(
        k, w, jnp.array([20.0, 0.0]), PP, MP, MAPP,
        plan_map="grid"))(keys, worlds)
    near = stg.world.centers[:, 0, :2] + stg.world.half_sizes[:, 0, :2] + 0.15
    stg = stg.replace(drone=stg.drone.replace(
        pos=jnp.concatenate([near, stg.drone.pos[:, 2:]], axis=1)))
    cg = jnp.broadcast_to(
        jnp.stack([near, jnp.zeros_like(near), jnp.zeros_like(near)],
                  axis=1)[:, None], (4, 60, 3, 2))
    t0 = time.time()
    gotg = jax.vmap(lambda s, cc: track_pallas.track_segment_grid(
        s, cc, PP, MP, SP))(stg, cg)
    jax.tree.map(lambda x: np.asarray(x), gotg)
    print(f"grid kernel compiled+ran {time.time()-t0:.1f}s", flush=True)
    wantg = jax.vmap(lambda s, cc: env._track_segment(
        s, cc, PP, MP, SP, "grid"))(stg, cg)
    ok2 = check("grid", wantg, gotg)
    m2 = float(np.asarray(wantg[3])[:, 2].max())
    print(f"grid collision metric fired: {m2 > 0} (m2max={m2:.4f})",
          flush=True)
    raise SystemExit(0 if (ok1 and ok2) else 1)


if __name__ == "__main__":
    main()
