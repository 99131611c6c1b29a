"""Device-mesh sharding of the env axis on the 8-device CPU harness."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from neoplanner_tpu.config import (MapParams, MissionParams, PlannerParams,
                                   SimParams, WorldParams)
from neoplanner_tpu.parallel import mesh as pmesh
from neoplanner_tpu.sim import env
from neoplanner_tpu.world import scenegen

pytestmark = pytest.mark.slow

PP = PlannerParams(max_iters=16, samples_per_piece=8, retry_num=1,
                   extra_lateral_scales=())
MP = MissionParams()
SP = SimParams()
MAPP = MapParams(width=64, height=64, origin_x=-2.0, origin_y=-3.2)
WP = WorldParams(num_boxes=4, max_boxes=8, rejection_rounds=2)


def test_sharded_segment_step():
    assert len(jax.devices()) == 8  # conftest forces the 8-device CPU mesh
    mesh = pmesh.make_mesh()
    B = 16  # 2 envs per device

    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B, WP)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = jax.vmap(lambda k, w: env.reset(k, w, None, PP, MP, MAPP))(
        keys, worlds)
    states = pmesh.shard_batch(states, mesh)

    # every leaf's leading axis is split across the 8 devices
    assert len(states.drone.pos.sharding.device_set) == 8

    def step_all(s):
        return jax.vmap(lambda x: env.step_segment(
            x, PP, MP, SP, mission_mode="random", plan_map="scene")[0])(s)

    step = pmesh.sharded_vmap_step(step_all, mesh)
    out = step(states)
    assert out.drone.pos.shape == (B, 3)
    assert len(out.drone.pos.sharding.device_set) == 8
    assert np.all(np.isfinite(np.asarray(out.drone.pos)))

    # sharded result matches the unsharded single-device computation
    states2 = jax.vmap(lambda k, w: env.reset(k, w, None, PP, MP, MAPP))(
        keys, worlds)
    ref, _ = jax.jit(jax.vmap(lambda x: env.step_segment(
        x, PP, MP, SP, mission_mode="random", plan_map="scene")))(states2)
    np.testing.assert_allclose(np.asarray(out.drone.pos),
                               np.asarray(ref.drone.pos), atol=5e-2)

    # cross-shard metric reduction (one all-reduce)
    wm = pmesh.mean_over_envs(jax.vmap(env.weighted_metric)(out), mesh)
    assert np.isfinite(float(wm))


def test_replicate():
    mesh = pmesh.make_mesh()
    x = pmesh.replicate(jnp.arange(6.0), mesh)
    assert len(x.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(x), np.arange(6.0))


def test_multislice_mesh_segment_step():
    """(dcn=2, dp=2, mdl=2) mesh: the env batch shards over (dcn, dp) jointly
    and the sharded segment matches the unsharded one — the multi-slice
    (DCN) layout of SURVEY §2.6, on the virtual 8-device harness."""
    mesh = pmesh.make_multislice_mesh(8, dcn=2, mdl=2)
    assert mesh.shape == {"dcn": 2, "dp": 2, "mdl": 2}
    B = 8

    worlds = scenegen.generate_batch(jax.random.PRNGKey(3), B, WP)
    keys = jax.random.split(jax.random.PRNGKey(4), B)
    states = jax.vmap(lambda k, w: env.reset(k, w, None, PP, MP, MAPP))(
        keys, worlds)
    sharded = pmesh.shard_batch_multislice(states, mesh)
    # the env axis spans dcn x dp = 4 device groups (replicated over mdl)
    assert len(sharded.drone.pos.sharding.device_set) == 8

    @jax.jit
    def step_all(s):
        return jax.vmap(lambda x: env.step_segment(
            x, PP, MP, SP, mission_mode="random", plan_map="scene")[0])(s)

    out = step_all(sharded)
    ref = step_all(states)
    np.testing.assert_allclose(np.asarray(out.drone.pos),
                               np.asarray(ref.drone.pos), atol=5e-2)
