"""World generation, voxelization, SDF, and .world I/O."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from neoplanner_tpu.config import MapParams, WorldParams
from neoplanner_tpu.world import scenegen, voxelize, worldio

REF_WORLD = "/root/reference/src/simulator/worlds/poles.world"


def test_generate_respects_bounds_and_clearance():
    wp = WorldParams()
    world = scenegen.generate(jax.random.PRNGKey(0), wp)
    c = np.asarray(world.centers)
    h = np.asarray(world.half_sizes)
    a = np.asarray(world.active)
    assert a.sum() >= wp.num_boxes - 3  # nearly all boxes placed
    assert np.all(c[a, 0] >= wp.pose_x_min) and np.all(c[a, 0] <= wp.pose_x_max)
    assert np.all(2 * h[a, 2] >= wp.size_z_min - 1e-5)
    # pairwise clearance among active boxes
    idx = np.where(a)[0]
    for ii, i in enumerate(idx):
        for j in idx[:ii]:
            dx = abs(c[i, 0] - c[j, 0])
            dy = abs(c[i, 1] - c[j, 1])
            conflict = (dx < h[i, 0] + h[j, 0] + wp.x_clearance
                        and dy < h[i, 1] + h[j, 1] + wp.y_clearance)
            assert not conflict, (i, j)


def test_generate_batch_unique():
    wp = WorldParams()
    worlds = scenegen.generate_batch(jax.random.PRNGKey(1), 4, wp)
    assert worlds.centers.shape == (4, wp.max_boxes, 3)
    assert not np.allclose(np.asarray(worlds.centers[0]),
                           np.asarray(worlds.centers[1]))


def test_voxelize_occupancy_marks_boxes():
    mp = MapParams(width=128, height=128, origin_x=-2.0, origin_y=-6.4)
    wp = WorldParams(num_boxes=8)
    world = scenegen.generate(jax.random.PRNGKey(2), wp)
    occ = np.asarray(voxelize.occupancy_2d(world, mp))
    c = np.asarray(world.centers)
    a = np.asarray(world.active)
    for i in np.where(a)[0]:
        col = int((c[i, 0] - mp.origin_x) / mp.resolution)
        row = int((c[i, 1] - mp.origin_y) / mp.resolution)
        if 0 <= row < mp.height and 0 <= col < mp.width:
            assert occ[row, col] == 1.0, i
    # free space far outside obstacle band
    assert occ[:, :10].sum() == 0  # x < -1 m is obstacle-free by config


def test_sdf_sign_and_value():
    wp = WorldParams(num_boxes=1, max_boxes=4)
    world = scenegen.generate(jax.random.PRNGKey(3), wp)
    c = np.asarray(world.centers)
    h = np.asarray(world.half_sizes)
    i = int(np.where(np.asarray(world.active))[0][0])
    center = jnp.array(c[i])
    d_center = float(voxelize.sdf(world, center))
    assert d_center < 0  # inside
    far = center + jnp.array([0.0, 0.0, 20.0])
    d_far = float(voxelize.sdf(world, far))
    assert abs(d_far - (20.0 - h[i, 2])) < 1e-3


def test_world_roundtrip(tmp_path):
    wp = WorldParams(num_boxes=6)
    world = scenegen.generate(jax.random.PRNGKey(4), wp)
    path = os.path.join(tmp_path, "test.world")
    worldio.write_world(world, path)
    back = worldio.parse_world(path, max_boxes=wp.max_boxes)
    a = np.asarray(world.active)
    got_c = np.asarray(back.centers)[np.asarray(back.active)]
    want_c = np.asarray(world.centers)[a]
    np.testing.assert_allclose(np.sort(got_c, axis=0), np.sort(want_c, axis=0),
                               atol=1e-4)


def test_parse_reference_world():
    """The reference's poles.world loads into a sane box scene."""
    world = worldio.parse_world(REF_WORLD)
    a = np.asarray(world.active)
    assert a.sum() == 13  # poles.world <state> carries 13 placed boxes
    c = np.asarray(world.centers)[a]
    h = np.asarray(world.half_sizes)[a]
    assert np.all(c[:, 0] > -5) and np.all(c[:, 0] < 35)
    assert np.all(h > 0)


def test_fill_unknown_3d_cavity():
    """The octomap plugin's unknown-space pass: an enclosed cavity (never
    reached by the free-space flood fill) becomes occupied; outside space
    stays free (plugin_build_octomap.cpp:317-357 semantics)."""
    from neoplanner_tpu.world import voxelize

    occ = np.zeros((8, 16, 16), np.float32)
    # hollow shell: walls at the faces of a 6x6x6 box, empty interior
    occ[2:7, 4:10, 4:10] = 1.0
    occ[3:6, 5:9, 5:9] = 0.0
    filled = np.asarray(voxelize.fill_unknown_3d(jnp.asarray(occ)))
    assert filled[4, 6, 6] == 1.0          # cavity voxel now occupied
    assert filled[4, 12, 12] == 0.0        # outside stays free
    assert filled[0, 0, 0] == 0.0          # seed corner column free
    # shell itself still occupied
    assert filled[2, 6, 6] == 1.0
    # without a cavity the pass is the identity
    solid = np.zeros((4, 8, 8), np.float32)
    solid[1:3, 2:5, 2:5] = 1.0
    np.testing.assert_array_equal(
        np.asarray(voxelize.fill_unknown_3d(jnp.asarray(solid))), solid)


def test_poles_world_voxelize_sandwiches_reference_bt():
    """End-to-end rasterization bound against the reference's own baked map:
    poles.bt was produced by the reference's Gazebo octomap plugin from the
    SAME poles.world this parser reads (plugin_build_octomap.cpp:104-146).
    Our analytic occupancy (cell-CENTER-inside) must be a subset of the bt's
    occupied voxels (any-overlap semantics), and inflating every footprint by
    the half-cell diagonal must cover the bt exactly — i.e. the two
    rasterizations differ only by sub-cell boundary semantics, nothing else
    in the parse -> voxelize pipeline. This is the oracle that bounds the
    forest.world approximation (see test_forest_world_footprint_bound):
    with the pipeline pinned here, the only unverifiable forest input is the
    assumed pine-tree primitive dimensions (worldio.py:24-37)."""
    import dataclasses

    from neoplanner_tpu.io import octomap

    vox, res = octomap.bt_to_voxels(
        "/root/reference/src/simulator/worlds/poles.bt")
    sel = (vox[:, 2] >= 1.8) & (vox[:, 2] <= 10.0)
    xy = vox[sel][:, :2]
    world = worldio.parse_world(REF_WORLD, max_boxes=None)
    origin = (-5.0, -15.0)
    H, W = 304, 400
    mp = MapParams(resolution=float(res), width=W, height=H,
                   origin_x=origin[0], origin_y=origin[1])
    occ_ours = np.asarray(voxelize.occupancy_2d(world, mp))
    occ_bt = np.zeros((H, W), np.float32)
    cols = ((xy[:, 0] - origin[0]) / res).astype(int)
    rows = ((xy[:, 1] - origin[1]) / res).astype(int)
    ok = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
    occ_bt[rows[ok], cols[ok]] = 1.0
    assert occ_ours.sum() > 1000 and occ_bt.sum() > occ_ours.sum()
    # lower bound: center-inside is a strict subset of the bt
    assert int((occ_ours * (1 - occ_bt)).sum()) == 0
    # upper bound: half-cell-diagonal inflation covers the bt
    inflate = res * 0.5 * np.sqrt(2.0)
    w_inf = dataclasses.replace(
        world, half_sizes=world.half_sizes + jnp.array([inflate, inflate, 0.0]))
    occ_inf = np.asarray(voxelize.occupancy_2d(w_inf, mp))
    assert int((occ_bt * (1 - occ_inf)).sum()) == 0
    # and the bands are tight (measured IoU 0.832 / 0.887)
    iou = (occ_ours * occ_bt).sum() / np.maximum(occ_ours, occ_bt).sum()
    iou_inf = (occ_inf * occ_bt).sum() / np.maximum(occ_inf, occ_bt).sum()
    assert iou > 0.8 and iou_inf > 0.85


def test_forest_world_footprint_bound():
    """Bound the forest.world pine-tree approximation (worldio.py:24-37).
    The checkout ships no forest oracle (no .bt/.pcd, no mesh files), so the
    tree primitive dimensions are assumed from the stock OSRF pine_tree.
    With the rasterization pipeline pinned bit-tight by
    test_poles_world_voxelize_sandwiches_reference_bt, this test bounds the
    remaining uncertainty: the occupied-slice footprint under the assumed
    trunk+canopy model sits strictly between the trunk-only lower bound and
    a +50%-canopy upper bound, and the trees stay inside the arena and
    clear of each other's trunks (generate_worlds.py forest layout)."""
    import dataclasses

    path = "/root/reference/src/simulator/worlds/forest.world"
    world = worldio.parse_world(path, max_boxes=None)
    a = np.asarray(world.active)
    n_prims = int(a.sum())
    assert n_prims % 2 == 0 and n_prims >= 2  # trunk+canopy per tree
    mp = MapParams()
    occ = np.asarray(voxelize.occupancy_2d(world, mp))
    # trunk-only lower bound / canopy+50% upper bound
    h = np.asarray(world.half_sizes)
    is_canopy = a & (h[:, 0] > 1.0)
    lo = dataclasses.replace(world, active=jnp.asarray(a & ~is_canopy))
    occ_lo = np.asarray(voxelize.occupancy_2d(lo, mp))
    scale = np.where(is_canopy[:, None], np.array([1.5, 1.5, 1.0]), 1.0)
    hi = dataclasses.replace(world,
                             half_sizes=world.half_sizes * jnp.asarray(scale))
    occ_hi = np.asarray(voxelize.occupancy_2d(hi, mp))
    assert occ_lo.sum() < occ.sum() < occ_hi.sum()
    # the footprint uncertainty band, as a fraction of the default map
    band = (occ_hi.sum() - occ_lo.sum()) / max(occ.sum(), 1.0)
    assert 0.0 < band < 2.5   # documented bound: canopy dominates, <2.5x
    # default model is fully inside the band cells
    assert int((occ * (1 - occ_hi)).sum()) == 0
    assert int((occ_lo * (1 - occ)).sum()) == 0
