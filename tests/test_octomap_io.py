"""Native .bt/.pcd codec: reference-asset parity + roundtrips."""

import numpy as np
import pytest

from neoplanner_tpu.io import octomap

POLES_BT = "/root/reference/src/simulator/worlds/poles.bt"
POLES_PCD = "/root/reference/src/simulator/worlds/poles.pcd"


def test_reference_bt_pcd_agree():
    """The reference's poles.bt and poles.pcd were written from the same octree
    (plugin_build_octomap.cpp:104-146): decoded occupied voxels must equal the
    pcd point set exactly."""
    vox, res = octomap.bt_to_voxels(POLES_BT)
    pts = octomap.read_pcd(POLES_PCD)
    assert res == pytest.approx(0.1)
    assert len(vox) == len(pts) == 190732
    sv = set(map(tuple, np.round(vox, 2)))
    sp = set(map(tuple, np.round(pts, 2)))
    assert len(sv & sp) == len(sp)


def test_bt_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    grid = (rng.random((12, 20, 24)) < 0.2).astype(np.float32)
    path = str(tmp_path / "test.bt")
    origin = (-1.2, -1.0, 0.0)
    octomap.write_bt(path, grid, 0.1, origin)
    back, res = octomap.bt_to_grid(path, origin, grid.shape)
    assert res == pytest.approx(0.1)
    np.testing.assert_array_equal(back, grid)


def test_pcd_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    for ascii_mode in (True, False):
        path = str(tmp_path / f"test_{ascii_mode}.pcd")
        octomap.write_pcd(path, pts, ascii_mode=ascii_mode)
        back = octomap.read_pcd(path)
        np.testing.assert_allclose(back, pts, atol=1e-5)


def test_bt_grid_load_into_planner_map():
    """Config 1 of BASELINE.json: a single plan on the reference's prebuilt
    octomap. Slice poles.bt at the occupancy band and verify the ESDF sees the
    poles."""
    import jax.numpy as jnp

    from neoplanner_tpu.mapping import esdf

    vox, res = octomap.bt_to_voxels(POLES_BT)
    # project the z in [1.8, 10] slice (map_server_onboard.launch:31-32)
    sel = (vox[:, 2] >= 1.8) & (vox[:, 2] <= 10.0)
    xy = vox[sel][:, :2]
    origin = (-5.0, -15.0)
    H, W = 300, 400
    occ = np.zeros((H, W), np.float32)
    cols = ((xy[:, 0] - origin[0]) / res).astype(int)
    rows = ((xy[:, 1] - origin[1]) / res).astype(int)
    ok = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
    occ[rows[ok], cols[ok]] = 1.0
    assert occ.sum() > 100
    emap = esdf.build(jnp.array(occ), jnp.array(origin), res)
    assert float(jnp.min(emap.esdf)) == 0.0
    assert float(jnp.max(emap.esdf)) > 1.0
