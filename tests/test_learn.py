"""PlannerNet, datagen, training, and the NN/NEO planners."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neoplanner_tpu.config import (CameraParams, MapParams, MissionParams,
                                   NetParams, PlannerParams, SimParams,
                                   WorldParams)
from neoplanner_tpu.core import frames
from neoplanner_tpu.core.types import DroneState
from neoplanner_tpu.learn import data, datagen, train
from neoplanner_tpu.models import planner_net
from neoplanner_tpu.plan import expert, neo, nn_init
from neoplanner_tpu.sim import env
from neoplanner_tpu.world import scenegen

pytestmark = pytest.mark.slow

CAM = CameraParams(width=64, height=48)
NETP = NetParams(img_width=64, img_height=48, backbone="smallconv")
PP = PlannerParams(max_iters=64)
MP = MissionParams()
SP = SimParams()
MAPP = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)


def rand_drone(key):
    kp, kv, ky = jax.random.split(key, 3)
    yaw = jax.random.uniform(ky, minval=-3.0, maxval=3.0)
    return DroneState(pos=jax.random.uniform(kp, (3,), minval=-2, maxval=2),
                      vel=jax.random.uniform(kv, (3,), minval=-1, maxval=1),
                      quat=frames.quat_from_yaw(yaw), yaw=yaw)


def test_wpts_body_world_roundtrip():
    drone = rand_drone(jax.random.PRNGKey(0))
    wpts = jnp.array([[2.0, 5.0], [1.0, -0.5]])      # (D, M-1)
    flat_local = data.wpts_to_body(drone, 2.0, wpts)
    assert flat_local.shape == (6,)
    back = data.wpts_from_body(drone, flat_local, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(wpts), atol=1e-4)


def test_motion_vector_structure():
    drone = rand_drone(jax.random.PRNGKey(1))
    init = jnp.array([[1.0, 2.0], [0.3, -0.2]])
    target = jnp.array([[6.0, 1.0], [0.8, 0.0]])
    m = data.motion_vector(drone, 2.0, init, target)
    assert m.shape == (24,)
    np.testing.assert_allclose(
        np.asarray(m[:3]),
        np.asarray(frames.quat_rotate_inv(drone.quat, drone.vel)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m[3:12]).reshape(3, 3),
        np.asarray(frames.quat_to_matrix(drone.quat)), atol=1e-5)
    # body-frame target position rotates back to the world offset
    tgt_body = m[18:21]
    world = frames.quat_rotate(drone.quat, tgt_body) + drone.pos
    np.testing.assert_allclose(np.asarray(world[:2]), [6.0, 1.0], atol=1e-4)
    assert abs(float(world[2]) - 2.0) < 1e-4


def test_planner_net_shapes_and_flat_contract():
    model = planner_net.create(NETP)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (3, 48, 64, 1)) * 255
    motion = jax.random.normal(key, (3, 24))
    variables = model.init(key, img, motion, train=False)
    out = model.apply(variables, img, motion, train=False)
    assert out.shape == (3, 9)
    flat = jnp.concatenate([img.reshape(3, -1), motion], axis=-1)
    out_flat = model.apply(variables, flat, train=False,
                           method=planner_net.PlannerNet.apply_flat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_flat), atol=1e-5)


def test_resnet18_forward():
    cfg = NetParams(img_width=64, img_height=48, backbone="resnet18")
    model = planner_net.create(cfg)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (2, 48, 64, 1))
    motion = jax.random.normal(key, (2, 24))
    variables = model.init(key, img, motion, train=False)
    out = model.apply(variables, img, motion, train=False)
    assert out.shape == (2, 9)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables["params"]))
    assert 10_000_000 < n_params < 13_000_000  # resnet18-class trunk


@pytest.fixture(scope="module")
def dataset():
    """Small real datagen batch: 3 envs x 8 segments."""
    return datagen.collect(jax.random.PRNGKey(0), num_envs=3, num_segments=8,
                           pp=PP, mp=MP, sp=SP, mapp=MAPP, cam=CAM,
                           wp=WorldParams(num_boxes=8))


def test_datagen_produces_samples(dataset):
    depths, motions, labels = dataset
    assert len(depths) >= 8          # most segments yield a successful plan
    assert depths.shape[1:] == (48, 64)
    assert motions.shape[1:] == (24,)
    assert labels.shape[1:] == (9,)
    assert np.all(np.isfinite(labels))
    # durations in the physical range
    assert np.all(labels[:, 6:] >= PP.t_min) and np.all(labels[:, 6:] <= PP.t_max)
    # depth images normalized to max 255
    assert np.allclose(depths.max(axis=(1, 2)), 255.0, atol=0.5)


def test_csv_roundtrip(dataset, tmp_path):
    depths, motions, labels = dataset
    datagen.export_csv(str(tmp_path), depths[:5], motions[:5], labels[:5])
    d2, m2, l2 = datagen.load_csv(str(tmp_path), CAM)
    assert len(d2) == 5
    np.testing.assert_allclose(d2, depths[:5], atol=1.0)   # uint8 quantization
    np.testing.assert_allclose(m2, motions[:5], atol=1e-4)
    np.testing.assert_allclose(l2, labels[:5], atol=1e-4)


def test_training_learns(dataset):
    depths, motions, labels = dataset
    cfg = train.TrainConfig(epochs=60, batch_size=min(16, len(depths)),
                            train_split=1.0)
    variables, history = train.train(jax.random.PRNGKey(0), depths, motions,
                                     labels, NETP, cfg)
    assert history["train_loss"][-1] < 0.5 * history["train_loss"][0]


def test_checkpoint_roundtrip(dataset, tmp_path):
    depths, motions, labels = dataset
    cfg = train.TrainConfig(epochs=1, batch_size=4, train_split=1.0)
    variables, _ = train.train(jax.random.PRNGKey(0), depths, motions, labels,
                               NETP, cfg)
    path = str(tmp_path / "ckpt")
    train.save_checkpoint(path, variables, NETP)
    restored, cfg2 = train.load_checkpoint(path)
    assert cfg2 == NETP
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(restored)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_nn_and_neo_planners(dataset):
    """NN predicts a trajectory; NEO refines it to feasibility (config 2)."""
    depths, motions, labels = dataset
    cfg = train.TrainConfig(epochs=30, batch_size=min(16, len(depths)),
                            train_split=1.0)
    variables, _ = train.train(jax.random.PRNGKey(0), depths, motions, labels,
                               NETP, cfg)

    world = scenegen.generate(jax.random.PRNGKey(7), WorldParams(num_boxes=8))
    state = env.reset(jax.random.PRNGKey(0), world, jnp.array([10.0, 0.0]),
                      PP, MP, MAPP)
    from neoplanner_tpu.sense import raycast
    depth = raycast.render_depth(world, state.drone.pos, state.drone.quat, CAM)
    plan_init = jnp.array([[0.0, 0.0], [0.0, 0.0]])
    target = jnp.array([[5.0, 0.0], [0.8, 0.0]])

    wpts, ts = nn_init.predict(variables, NETP, depth, state.drone, 2.0,
                               plan_init, target, PP)
    assert wpts.shape == (2, 2) and ts.shape == (3,)
    assert np.all(np.isfinite(np.asarray(wpts)))

    traj = jax.jit(neo.enhanced_plan, static_argnames=("np_cfg", "pp"))(
        state.emap, variables, NETP, depth, state.drone, 2.0, plan_init,
        target, jax.random.PRNGKey(1), PP)
    assert bool(traj.ok)
    assert float(traj.costs[3]) * PP.w_collision <= PP.collision_cost_tol


def test_bf16_inference_knob(monkeypatch):
    """NEO_NN_DTYPE=bf16 (nn_init._infer_dtype): the bf16 compute path must
    track f32 inference to ~bf16 roundoff on the same f32 checkpoint, and the
    predict contract (f32 outputs, clipped ts) must hold."""
    model = planner_net.create(NETP)
    key = jax.random.PRNGKey(3)
    img = jax.random.uniform(key, (1, NETP.img_height, NETP.img_width, 1),
                             minval=0.0, maxval=255.0)
    motion = jax.random.normal(jax.random.PRNGKey(4), (1, 24))
    variables = model.init(jax.random.PRNGKey(5), img, motion, train=False)

    drone = rand_drone(jax.random.PRNGKey(6))
    depth = jax.random.uniform(jax.random.PRNGKey(7),
                               (NETP.img_height, NETP.img_width),
                               minval=0.0, maxval=6.0)
    plan_init = jnp.array([[0.0, 0.0], [0.0, 0.0]])
    target = jnp.array([[5.0, 0.0], [0.8, 0.0]])

    monkeypatch.delenv("NEO_NN_DTYPE", raising=False)
    wpts32, ts32 = nn_init.predict(variables, NETP, depth, drone, 2.0,
                                   plan_init, target, PP)
    monkeypatch.setenv("NEO_NN_DTYPE", "bf16")
    wpts16, ts16 = nn_init.predict(variables, NETP, depth, drone, 2.0,
                                   plan_init, target, PP)
    assert wpts16.dtype == jnp.float32 and ts16.dtype == jnp.float32
    assert np.all(np.asarray(ts16) >= PP.t_min) \
        and np.all(np.asarray(ts16) <= PP.t_max)
    # bf16 has ~3 decimal digits; the net is shallow, so stay within a few %
    np.testing.assert_allclose(np.asarray(wpts16), np.asarray(wpts32),
                               rtol=0.05, atol=0.15)
    np.testing.assert_allclose(np.asarray(ts16), np.asarray(ts32),
                               rtol=0.05, atol=0.15)
