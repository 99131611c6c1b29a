"""Deployment export roundtrip, conv1d model variant, visualization smoke."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from neoplanner_tpu.config import MapParams, NetParams, WorldParams
from neoplanner_tpu.learn import export, train
from neoplanner_tpu.models import planner_net
from neoplanner_tpu.utils import viz
from neoplanner_tpu.world import scenegen, voxelize

NETP = NetParams(img_width=64, img_height=48, backbone="smallconv")


def test_export_roundtrip(tmp_path):
    variables = train.init_params(jax.random.PRNGKey(0), NETP)
    model = planner_net.create(NETP)
    n_in = NETP.img_width * NETP.img_height + 24
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, n_in))
    want = model.apply(variables, x, train=False,
                       method=planner_net.PlannerNet.apply_flat)

    path = str(tmp_path / "planner_net.jaxexport")
    export.save(path, variables, NETP)
    assert os.path.getsize(path) > 1000
    engine = export.load(path)
    got = engine(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    mean_ms, p50_ms = export.latency_test(engine, np.asarray(x), warmup=2,
                                          iters=5)
    assert p50_ms > 0


def test_conv1d_variant():
    cfg = NetParams(img_width=64, img_height=48, backbone="smallconv",
                    fusion_arch="conv1d")
    model = planner_net.create(cfg)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (2, 48, 64, 1)) * 255
    motion = jax.random.normal(key, (2, 24))
    variables = model.init(key, img, motion, train=False)
    out = model.apply(variables, img, motion, train=False)
    assert out.shape == (2, 9)


def test_viz_outputs(tmp_path):
    mapp = MapParams(width=128, height=96, origin_x=-2.0, origin_y=-4.8)
    world = scenegen.generate(jax.random.PRNGKey(0), WorldParams(num_boxes=6))
    occ = np.asarray(voxelize.occupancy_2d(world, mapp))

    txt = viz.ascii_map(occ, paths=[np.array([[0.0, 0.0], [1.0, 0.0]])],
                        origin=(mapp.origin_x, mapp.origin_y),
                        resolution=mapp.resolution,
                        markers=[(5.0, 0.0, "X")])
    assert "#" in txt and "o" in txt

    path = np.stack([np.linspace(0, 8, 50), np.zeros(50)], axis=-1)
    vel = np.abs(np.sin(np.linspace(0, 3, 50)))
    out = viz.plot_mission(occ, (mapp.origin_x, mapp.origin_y), mapp.resolution,
                           flown_path=path, planned_path=path, planned_vel=vel,
                           wpts=np.array([[2.0, 5.0], [0.5, -0.5]]),
                           goal=np.array([8.0, 0.0]),
                           save_path=str(tmp_path / "mission.png"))
    assert os.path.getsize(out) > 10000

    from neoplanner_tpu.mapping import esdf as esdf_mod
    emap = esdf_mod.build(jnp.array(occ), jnp.array([mapp.origin_x,
                                                     mapp.origin_y]),
                          mapp.resolution)
    out2 = viz.esdf_heatmap(np.asarray(emap.esdf),
                            (mapp.origin_x, mapp.origin_y), mapp.resolution,
                            save_path=str(tmp_path / "esdf.png"))
    assert os.path.getsize(out2) > 10000
