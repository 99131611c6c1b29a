"""Depth raycaster and occupancy mapping goldens + the vision-based closed loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neoplanner_tpu.config import (CameraParams, MapParams, MissionParams,
                                   PlannerParams, SimParams, WorldParams)
from neoplanner_tpu.core import frames
from neoplanner_tpu.core.types import SHAPE_BOX, SHAPE_CYLINDER, BoxWorld
from neoplanner_tpu.mapping import occupancy
from neoplanner_tpu.sense import raycast
from neoplanner_tpu.sim import env
from neoplanner_tpu.world import scenegen, voxelize

pytestmark = pytest.mark.slow

CAM = CameraParams(width=64, height=48)


def single_box_world(center=(4.0, 0.0, 2.0), half=(0.5, 1.0, 2.0),
                     shape=SHAPE_BOX):
    K = 4
    centers = np.zeros((K, 3), np.float32)
    halfs = np.full((K, 3), 0.01, np.float32)
    active = np.zeros(K, bool)
    shapes = np.zeros(K, np.int32)
    centers[0] = center
    halfs[0] = half
    active[0] = True
    shapes[0] = shape
    return BoxWorld(centers=jnp.array(centers), half_sizes=jnp.array(halfs),
                    active=jnp.array(active), shape=jnp.array(shapes))


def test_depth_box_front():
    """Camera at origin looking +x at a box face 3.5 m away."""
    world = single_box_world()
    pos = jnp.array([0.0, 0.0, 2.0])
    quat = frames.quat_identity()
    depth = raycast.render_depth(world, pos, quat, CAM)
    center_px = depth[CAM.height // 2, CAM.width // 2]
    assert float(center_px) == pytest.approx(3.5, abs=0.02)
    # corners of the image miss the box -> max_range (box subtends a finite angle)
    assert float(depth[0, 0]) == pytest.approx(CAM.max_range, abs=1e-3)


def test_depth_cylinder_front():
    world = single_box_world(center=(3.0, 0.0, 2.0), half=(0.4, 0.4, 2.0),
                             shape=SHAPE_CYLINDER)
    pos = jnp.array([0.0, 0.0, 2.0])
    depth = raycast.render_depth(world, pos, frames.quat_identity(), CAM)
    assert float(depth[CAM.height // 2, CAM.width // 2]) == pytest.approx(
        2.6, abs=0.02)


def test_depth_yawed_camera():
    """Yaw the camera 90°: the box at +x disappears, a box at +y appears."""
    world = single_box_world(center=(0.0, 3.0, 2.0))
    pos = jnp.array([0.0, 0.0, 2.0])
    quat = frames.quat_from_yaw(jnp.float32(np.pi / 2))
    depth = raycast.render_depth(world, pos, quat, CAM)
    # box y-extent is [2, 4]: the near face sits 2.0 m along the view axis
    assert float(depth[CAM.height // 2, CAM.width // 2]) == pytest.approx(
        2.0, abs=0.02)


def test_depth_ground_plane():
    """Pitch down via flatness attitude is complex; check ground via low camera."""
    world = single_box_world(center=(50.0, 50.0, 2.0))  # box far away
    pos = jnp.array([0.0, 0.0, 0.3])
    depth = np.asarray(raycast.render_depth(world, pos, frames.quat_identity(),
                                            CAM))
    # lower image rows (larger v) look downward -> hit the ground within range
    assert depth[-1, CAM.width // 2] < CAM.max_range
    assert depth[0, CAM.width // 2] == pytest.approx(CAM.max_range, abs=1e-3)


def test_depth_matches_sdf_march(rng):
    """Golden: analytic depth equals brute-force SDF sphere tracing."""
    wp = WorldParams(num_boxes=6)
    world = scenegen.generate(jax.random.PRNGKey(11), wp)
    # camera placed near this seed's box cluster so faces are inside max_range
    pos = jnp.array([6.5, -1.0, 2.0])
    quat = frames.quat_from_yaw(jnp.float32(0.2))
    depth = np.asarray(raycast.render_depth(world, pos, quat, CAM))

    dirs = np.asarray(frames.quat_rotate(
        quat[None, None], raycast.ray_dirs_camera(CAM)))
    # candidate pixels: real hits away from depth discontinuities (edge-grazing
    # rays are ambiguous for both the slab test and sphere tracing)
    cands = []
    for v in range(1, CAM.height - 1):
        for u in range(1, CAM.width - 1):
            patch = depth[v - 1:v + 2, u - 1:u + 2]
            if depth[v, u] < CAM.max_range - 0.05 and \
                    patch.max() - patch.min() < 0.2:
                cands.append((v, u))
    assert len(cands) > 30  # the scene is actually visible
    checked = 0
    for idx in rng.permutation(len(cands))[:12]:
        v, u = cands[idx]
        d = dirs[v, u]
        # sphere-trace the scene SDF
        t = 0.0
        for _ in range(200):
            p = np.asarray(pos) + t * d
            s = float(voxelize.sdf(world, jnp.array(p)))
            s = min(s, p[2])  # ground plane
            if s < 1e-4 or t > 12.0:
                break
            t += max(s, 1e-4)
        x_body = np.asarray(frames.quat_rotate(quat, jnp.array([1.0, 0.0, 0.0])))
        want = t * float(d @ x_body)  # z-depth = range along body x
        want_clipped = min(max(want, 0.0), CAM.max_range)
        if abs(want_clipped - CAM.max_range) < 0.05 or want < CAM.min_range:
            continue  # near-miss rays are resolution-sensitive
        assert abs(depth[v, u] - want_clipped) < 0.05, (v, u, depth[v, u], want)
        checked += 1
    assert checked >= 4  # the sweep actually compared interior hits


def test_occupancy_mapping_converges():
    """Observing a box from several poses marks it occupied and carves free space."""
    mapp = MapParams(width=128, height=96, origin_x=-2.0, origin_y=-4.8)
    world = single_box_world(center=(4.0, 0.0, 2.0), half=(0.5, 1.0, 2.0))
    logodds = occupancy.logodds_init(mapp)
    quat = frames.quat_identity()
    for y in (-1.0, 0.0, 1.0):
        pos = jnp.array([0.0, y, 2.0])
        depth = raycast.render_depth(world, pos, quat, CAM)
        logodds = occupancy.insert_depth(logodds, depth, pos, quat, CAM, mapp)
    occ = np.asarray(occupancy.to_occupancy(logodds, mapp))
    # front face of the box (x=3.5, y in [-1, 1]) observed occupied
    front_col = int((3.5 - mapp.origin_x) / mapp.resolution)
    rows = slice(int((-0.8 + 4.8) / 0.1), int((0.8 + 4.8) / 0.1))
    assert occ[rows, front_col:front_col + 2].sum() >= 10
    # free corridor between camera and box carved free
    mid_col = int((2.0 - mapp.origin_x) / mapp.resolution)
    mid_row = int((0.0 + 4.8) / mapp.resolution)
    assert occ[mid_row - 3:mid_row + 3, mid_col - 3:mid_col + 3].sum() == 0
    assert np.asarray(logodds)[mid_row, mid_col] < 0  # actually carved, not unknown


def test_vision_closed_loop():
    """Config 3 of BASELINE.json, onboard sensing: navigate with the map built
    online from rendered depth only."""
    pp = PlannerParams(max_iters=96)
    mp = MissionParams()
    sp = SimParams()
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    world = scenegen.generate(jax.random.PRNGKey(7), WorldParams(num_boxes=10))
    goal = jnp.array([12.0, 0.0])
    state = env.reset(jax.random.PRNGKey(0), world, goal, pp, mp, mapp,
                      sensing="depth")
    assert float(jnp.sum(occupancy.to_occupancy(state.logodds, mapp))) \
        == 0.0  # map starts unknown
    step = jax.jit(env.step_segment, static_argnames=(
        "pp", "mp", "sp", "mission_mode", "sensing", "mapp", "cam"))
    for _ in range(30):
        state, _ = step(state, pp, mp, sp, "manual", "depth", mapp, CAM)
        if bool(state.reached):
            break
    assert bool(state.reached), (float(state.steps), bool(state.failed))
    assert float(jnp.sum(occupancy.to_occupancy(state.logodds, mapp))) \
        > 0  # it mapped something
    # no collision en route: collision term of the metric stays ~0
    assert float(state.metrics[2]) < 1e-3


def test_insert_depth_2d_matches_3d_projection():
    """Per-column polar fusion builds the same projected map as the strided
    3-D carving wherever the 3-D map is *known*: identical occupied surface,
    identical free corridor (the 2-D form may leave more cells unknown behind
    obstacles, which binarizes to free either way)."""
    mapp = MapParams(width=128, height=96, origin_x=-2.0, origin_y=-4.8)
    world = single_box_world(center=(4.0, 0.0, 2.0), half=(0.5, 1.0, 2.0))
    quat = frames.quat_identity()
    lo3 = occupancy.logodds_init(mapp)
    lo2 = occupancy.logodds_init(mapp)
    for y in (-1.0, 0.0, 1.0):
        pos = jnp.array([0.0, y, 2.0])
        depth = raycast.render_depth(world, pos, quat, CAM)
        lo3 = occupancy.insert_depth(lo3, depth, pos, quat, CAM, mapp)
        lo2 = occupancy.insert_depth_2d(lo2, depth, pos, quat, CAM, mapp)
    occ3 = np.asarray(occupancy.to_occupancy(lo3, mapp))
    occ2 = np.asarray(occupancy.to_occupancy(lo2, mapp))

    # the visible front face is occupied in both
    front_col = int((3.5 - mapp.origin_x) / mapp.resolution)
    rows = slice(int((-0.8 + 4.8) / 0.1), int((0.8 + 4.8) / 0.1))
    assert occ2[rows, front_col:front_col + 2].sum() >= 10
    # the free corridor is carved free (not merely unknown) in both
    mid_col = int((2.0 - mapp.origin_x) / mapp.resolution)
    mid_row = int((0.0 + 4.8) / mapp.resolution)
    assert occ2[mid_row - 3:mid_row + 3, mid_col - 3:mid_col + 3].sum() == 0
    assert np.asarray(lo2)[mid_row, mid_col] < 0
    # no cell occupied in 2d that 3d considers carved-free (surface agreement)
    conflict = (occ2 > 0.5) & (np.asarray(lo3) < -0.5)
    assert conflict.sum() == 0


def test_polar_columns_zrow_math():
    """The HBM rewrite of polar_columns (round 5) computes the per-pixel
    world z-component as dz = d_body . R(q)^T e_z instead of materializing
    the rotated (H, W, 3) world-dirs tensor (its padded temps were the
    vision batch ceiling at B=8192). Pin the identity against the explicit
    rotated form over random tilted poses, and hnorm = sqrt(1 - dz^2) for
    unit rays."""
    mapp = MapParams(width=128, height=96, origin_x=-2.0, origin_y=-4.8)
    key = jax.random.PRNGKey(11)
    db = raycast.ray_dirs_camera(CAM, 2)                 # (Hs, W, 3), unit
    for _ in range(3):
        key, k1, k2, k3 = jax.random.split(key, 4)
        yaw = float(jax.random.uniform(k1, (), minval=-3.1, maxval=3.1))
        tilt = float(jax.random.uniform(k2, (), minval=-0.4, maxval=0.4))
        qy = jnp.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])
        qp = jnp.array([np.cos(tilt / 2), 0.0, np.sin(tilt / 2), 0.0])
        quat = frames.quat_multiply(qy, qp)
        dw = frames.quat_rotate(quat[None, None, :], db)
        dz_ref = dw[..., 2]
        hn_ref = jnp.linalg.norm(dw[..., :2], axis=-1)
        dz_new = db @ frames.quat_rotate_inv(quat, jnp.array([0.0, 0.0, 1.0]))
        hn_new = jnp.sqrt(jnp.maximum(1.0 - dz_new * dz_new, 0.0))
        np.testing.assert_allclose(np.asarray(dz_new), np.asarray(dz_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(hn_new), np.asarray(hn_ref),
                                   atol=1e-5)
        # and the function end-to-end stays finite with sane ranges
        depth = jax.random.uniform(k3, db.shape[:2], minval=0.3,
                                   maxval=CAM.max_range)
        pos = jnp.array([0.0, 0.0, 2.0])
        r_hit, r_carve, u_dir = occupancy.polar_columns(
            depth, pos, quat, CAM, mapp, row_stride=2)
        assert np.isfinite(np.asarray(r_hit)).all()
        assert np.isfinite(np.asarray(r_carve)).all()
        assert bool(jnp.all(r_carve <= r_hit + 1e-5))


def test_pallas_renderer_matches_xla():
    """The fused Pallas trace kernel (sense/raycast_pallas.py) renders the
    same depth image as the XLA renderer, including cylinders, ground and
    max-range pixels, under env-batched vmap."""
    from neoplanner_tpu.sense import raycast_pallas

    worlds = scenegen.generate_batch(jax.random.PRNGKey(3), 3,
                                     WorldParams(num_boxes=8))
    # make one primitive a cylinder in every env
    worlds = worlds.replace(shape=worlds.shape.at[:, 0].set(SHAPE_CYLINDER))
    pos = jnp.array([[0.0, 0.0, 2.0], [2.0, 1.0, 1.5], [5.0, -2.0, 2.5]])
    quat = jax.vmap(frames.quat_from_yaw)(jnp.array([0.0, 0.7, -2.1]))

    want = jax.vmap(lambda w, p, q: raycast.render_depth(w, p, q, CAM)
                    )(worlds, pos, quat)
    got = jax.vmap(lambda w, p, q: raycast_pallas.render_depth(
        w, p, q, CAM, interpret=True))(worlds, pos, quat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def _binarize(lo, mp):
    return np.asarray(occupancy.to_occupancy(lo, mp))


def _iou(a, b):
    inter = float((a * b).sum())
    union = float(((a + b) > 0).sum())
    return inter / max(union, 1.0)


def test_fusion_map_agreement():
    """Map-agreement bounds between the three fusion backends over a short
    scripted flight (VERDICT round-2 item 7: turn 'quality-neutral' into an
    assertion). The dense polar kernel must produce a superset of the
    scatter form's carving (it fixes the 48-sample ray's undersampling) and
    agree with it on occupancy; the 2-D forms must agree with the full 3-D
    carving's projected occupancy."""
    from neoplanner_tpu.mapping import occupancy_pallas

    mp = MapParams(width=128, height=96, origin_x=-2.0, origin_y=-4.8)
    world = scenegen.generate(jax.random.PRNGKey(2), WorldParams(num_boxes=8))
    poses = [jnp.array([0.5 + 0.8 * i, 0.2 * i, 2.0]) for i in range(5)]
    yaws = [0.0, 0.1, -0.1, 0.2, 0.0]

    lo_2d = lo_dense = lo_3d = occupancy.logodds_init(mp)
    for pos, yaw in zip(poses, yaws):
        quat = frames.quat_from_yaw(jnp.asarray(yaw))
        depth = raycast.render_depth(world, pos, quat, CAM)
        lo_2d = occupancy.insert_depth_2d(lo_2d, depth, pos, quat, CAM, mp)
        lo_dense = occupancy_pallas.insert_depth_2d_dense(
            lo_dense, depth, pos, quat, CAM, mp, interpret=True)
        lo_3d = occupancy.insert_depth(lo_3d, depth, pos, quat, CAM, mp)

    occ_2d, occ_dense, occ_3d = (_binarize(x, mp)
                                 for x in (lo_2d, lo_dense, lo_3d))
    # occupancy agreement: the surfaces all three see are the same cells
    assert _iou(occ_dense, occ_2d) > 0.6, _iou(occ_dense, occ_2d)
    assert _iou(occ_2d, occ_3d) > 0.4, _iou(occ_2d, occ_3d)
    # what 2d marks occupied, 3d must essentially contain (the 2-D forms keep
    # only the nearest per-column hit, a subset of 3-D's surface cells)
    if occ_2d.sum():
        assert (occ_2d * occ_3d).sum() / occ_2d.sum() > 0.8

    # dense carving is a (near-)superset of scatter carving: the scatter ray
    # undersamples beyond carve_samples*res
    free_2d = np.asarray(lo_2d) < -1e-3
    free_dense = np.asarray(lo_dense) < -1e-3
    assert (free_2d & free_dense).sum() / max(free_2d.sum(), 1) > 0.9
    assert free_dense.sum() >= free_2d.sum()


def test_row_strided_fusion_agreement():
    """Fusion-frame row striding (MapParams.fusion_row_stride): a strided
    render is exactly the row subset of the full render, and the fused polar
    map it produces agrees with the full-resolution one (the 2-D consumers
    reduce each column to one range, so coarse vertical sampling is enough)."""
    from neoplanner_tpu.mapping import occupancy_pallas

    mp = MapParams(width=128, height=96, origin_x=-2.0, origin_y=-4.8)
    world = scenegen.generate(jax.random.PRNGKey(2), WorldParams(num_boxes=8))
    stride = 4

    quat = frames.quat_from_yaw(jnp.asarray(0.1))
    pos = jnp.array([0.5, 0.2, 2.0])
    full = raycast.render_depth(world, pos, quat, CAM)
    strided = raycast.render_depth(world, pos, quat, CAM, row_stride=stride)
    np.testing.assert_allclose(np.asarray(strided),
                               np.asarray(full)[stride // 2::stride],
                               rtol=1e-6, atol=1e-6)

    poses = [jnp.array([0.5 + 0.8 * i, 0.2 * i, 2.0]) for i in range(5)]
    yaws = [0.0, 0.1, -0.1, 0.2, 0.0]
    lo_full = lo_str = occupancy.logodds_init(mp)
    for pos, yaw in zip(poses, yaws):
        quat = frames.quat_from_yaw(jnp.asarray(yaw))
        depth = raycast.render_depth(world, pos, quat, CAM)
        d_str = raycast.render_depth(world, pos, quat, CAM, row_stride=stride)
        lo_full = occupancy_pallas.insert_depth_2d_dense(
            lo_full, depth, pos, quat, CAM, mp, interpret=True)
        lo_str = occupancy_pallas.insert_depth_2d_dense(
            lo_str, d_str, pos, quat, CAM, mp, row_stride=stride,
            interpret=True)

    occ_full, occ_str = _binarize(lo_full, mp), _binarize(lo_str, mp)
    assert _iou(occ_str, occ_full) > 0.75, _iou(occ_str, occ_full)
    free_full = np.asarray(lo_full) < -1e-3
    free_str = np.asarray(lo_str) < -1e-3
    assert (free_str & free_full).sum() / max(free_str.sum(), 1) > 0.95


def test_dense_fusion_far_corner_coverage():
    """Corner rays reach max_range*sqrt(1+tan^2(hfov/2)) ~ 8.2 m horizontal —
    well past max_range. The camera-derived v2 row window must cover the hits
    and carving the scatter backend records there (advisor round 4: the old
    fixed 136-row window silently dropped the 64-82-cell band)."""
    from neoplanner_tpu.mapping import occupancy_pallas

    mp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    cam = CameraParams(width=160, height=120)
    # box at r=7.4 m, azimuth ~40 deg: z-depth of its face ~5.5 m < max_range
    world = single_box_world(center=(5.7, 4.8, 2.0), half=(0.4, 0.4, 2.0))
    pos = jnp.array([0.0, 0.0, 2.0])
    quat = frames.quat_identity()
    depth = raycast.render_depth(world, pos, quat, cam)

    lo_2d = occupancy.insert_depth_2d(
        occupancy.logodds_init(mp), depth, pos, quat, cam, mp)
    lo_dense = occupancy_pallas.insert_depth_2d_dense(
        occupancy.logodds_init(mp), depth, pos, quat, cam, mp,
        interpret=True)
    occ_2d, occ_dense = _binarize(lo_2d, mp), _binarize(lo_dense, mp)

    # radius of each cell center from the camera
    yy = (np.arange(mp.height)[:, None] + 0.5) * mp.resolution + mp.origin_y
    xx = (np.arange(mp.width)[None, :] + 0.5) * mp.resolution + mp.origin_x
    r = np.sqrt((xx - float(pos[0])) ** 2 + (yy - float(pos[1])) ** 2)

    far = r > cam.max_range + 0.4
    assert (occ_2d * far).sum() > 0          # the scenario exercises the band
    # every far scatter hit has a dense hit within one cell (polar-vs-point
    # rasterization can shift the marked cell by one)
    hit_rows, hit_cols = np.nonzero(occ_2d * far)
    for hr, hc in zip(hit_rows, hit_cols):
        nb = occ_dense[max(hr - 1, 0):hr + 2, max(hc - 1, 0):hc + 2]
        assert nb.sum() > 0, (hr, hc)
    # far carving: dense must cover the scatter form's far free cells
    free_2d = (np.asarray(lo_2d) < -1e-3) & far
    free_dense = (np.asarray(lo_dense) < -1e-3) & far
    assert free_2d.sum() > 0
    assert (free_2d & free_dense).sum() / free_2d.sum() > 0.98


def test_dense_fusion_dynamic_row_window(monkeypatch):
    """The v2 whole-grid fusion kernel's dynamic-row path (maps taller than
    the 136-row window, e.g. the 192x256 vision map) must be bit-equal to the
    static whole-grid form (the row window is an optimization: every in-range
    cell sits inside it), agree with the scatter backend on occupancy up to
    the known polar-vs-point-hit rasterization delta, and leave rows far
    outside any camera window untouched."""
    from neoplanner_tpu.mapping import occupancy_pallas

    mp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    cam = CameraParams(width=160, height=120)
    # must exercise dynamic rows (derived window 176 < 192 map rows)
    assert mp.height > occupancy_pallas._row_window_cells(cam, mp)
    world = scenegen.generate(jax.random.PRNGKey(3), WorldParams(num_boxes=8))

    frames_in = []
    lo_dyn = lo_2d = occupancy.logodds_init(mp)
    for i in range(4):
        pos = jnp.array([0.4 + 0.9 * i, 0.2 * i - 0.3, 2.0])
        quat = frames.quat_from_yaw(jnp.asarray(0.15 * ((-1) ** i)))
        depth = raycast.render_depth(world, pos, quat, cam)
        frames_in.append((depth, pos, quat))
        lo_dyn = occupancy_pallas.insert_depth_2d_dense(
            lo_dyn, depth, pos, quat, cam, mp, interpret=True)
        lo_2d = occupancy.insert_depth_2d(lo_2d, depth, pos, quat, cam, mp)

    # static whole-grid arm: window as tall as the map -> no dynamic rows
    monkeypatch.setattr(occupancy_pallas, "_WH", mp.height)
    lo_static = occupancy.logodds_init(mp)
    for depth, pos, quat in frames_in:
        lo_static = occupancy_pallas.insert_depth_2d_dense(
            lo_static, depth, pos, quat, cam, mp, interpret=True)
    np.testing.assert_allclose(np.asarray(lo_dyn), np.asarray(lo_static),
                               atol=1e-6)

    occ_dense, occ_2d = _binarize(lo_dyn, mp), _binarize(lo_2d, mp)
    # hits are exact point scatters in both backends now; remaining occupancy
    # deltas come only from clip-order interplay with the denser carve
    assert _iou(occ_dense, occ_2d) > 0.45, _iou(occ_dense, occ_2d)
    assert (occ_dense * occ_2d).sum() / max(occ_2d.sum(), 1) > 0.5
    free_2d = np.asarray(lo_2d) < -1e-3
    free_dense = np.asarray(lo_dyn) < -1e-3
    assert (free_2d & free_dense).sum() / max(free_2d.sum(), 1) > 0.9
    assert free_dense.sum() >= free_2d.sum()


def test_multi_frame_fusion():
    """insert_depth_2d_dense_multi (one v3 kernel call, in-kernel one-hot
    hit matmuls) vs F sequential insert_depth_2d_dense calls on the same
    frames. v3 applies carve+hit in ONE clip per frame (insert_depth_2d's
    exact order); the sequential dense path clips carves before scattering
    hits, so the two may differ by <= |l_miss| per frame, only for cells
    driven below the lower clamp — always far below the occupancy
    threshold. Binarized maps must be IDENTICAL; interior log-odds
    bit-equal up to hit-accumulation rounding."""
    from neoplanner_tpu.mapping import occupancy_pallas

    mp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    cam = CameraParams(width=160, height=120)
    world = scenegen.generate(jax.random.PRNGKey(7), WorldParams(num_boxes=9))

    # simulate a couple of segments so clamp saturation actually engages
    lo_seq = lo_multi = occupancy.logodds_init(mp)
    for seg in range(3):
        poss, quats, depths = [], [], []
        for i in range(6):
            pos = jnp.array([0.25 + 0.5 * (6 * seg + i) / 6.0,
                             0.15 * np.sin(0.7 * (6 * seg + i)), 2.0])
            quat = frames.quat_from_yaw(jnp.asarray(0.2 * np.sin(seg + i)))
            depth = raycast.render_depth(world, pos, quat, cam, row_stride=4)
            poss.append(pos)
            quats.append(quat)
            depths.append(depth)
            lo_seq = occupancy_pallas.insert_depth_2d_dense(
                lo_seq, depth, pos, quat, cam, mp, row_stride=4,
                interpret=True)
        lo_multi = occupancy_pallas.insert_depth_2d_dense_multi(
            lo_multi, jnp.stack(depths), jnp.stack(poss), jnp.stack(quats),
            cam, mp, row_stride=4, interpret=True)

        occ_s, occ_m = _binarize(lo_seq, mp), _binarize(lo_multi, mp)
        np.testing.assert_array_equal(occ_m, occ_s)
        ls, lm = np.asarray(lo_seq), np.asarray(lo_multi)
        l_min = occupancy._l(mp.clamp_min)
        l_max = occupancy._l(mp.clamp_max)
        upd = max(occupancy._l(mp.prob_hit), -occupancy._l(mp.prob_miss))
        # away from the clamp bounds the two orderings are bit-equal
        interior = (ls > l_min + 6 * upd) & (ls < l_max - 6 * upd)
        np.testing.assert_allclose(lm[interior], ls[interior], atol=1e-5)
        assert np.abs(lm - ls).max() <= 6 * upd + 1e-5
        # free/occupied masses match (reordering never creates or destroys
        # carved space)
        assert ((ls < -1e-3) == (lm < -1e-3)).mean() > 0.999


def test_multi_frame_fusion_batched():
    """The env-vmapped multi-frame path (custom_vmap collapse) matches the
    single-env calls."""
    from neoplanner_tpu.mapping import occupancy_pallas

    mp = MapParams(width=128, height=96)
    cam = CameraParams(width=64, height=48)
    worlds = [scenegen.generate(jax.random.PRNGKey(s),
                                WorldParams(num_boxes=6)) for s in (0, 1, 2)]
    F = 3
    depths, poss, quats, los = [], [], [], []
    for e, w in enumerate(worlds):
        pe, qe, de = [], [], []
        for i in range(F):
            pos = jnp.array([0.3 * i + 0.1 * e, 0.1 * e - 0.2, 2.0])
            quat = frames.quat_from_yaw(jnp.asarray(0.1 * (i - e)))
            pe.append(pos)
            qe.append(quat)
            de.append(raycast.render_depth(w, pos, quat, cam))
        poss.append(jnp.stack(pe))
        quats.append(jnp.stack(qe))
        depths.append(jnp.stack(de))
        los.append(occupancy.logodds_init(mp))
    lo_b = jnp.stack(los)
    d_b, p_b, q_b = jnp.stack(depths), jnp.stack(poss), jnp.stack(quats)

    batched = jax.vmap(lambda lo, d, p, q:
                       occupancy_pallas.insert_depth_2d_dense_multi(
                           lo, d, p, q, cam, mp, interpret=True))(
        lo_b, d_b, p_b, q_b)
    for e in range(3):
        single = occupancy_pallas.insert_depth_2d_dense_multi(
            los[e], depths[e], poss[e], quats[e], cam, mp, interpret=True)
        np.testing.assert_allclose(np.asarray(batched[e]),
                                   np.asarray(single), atol=1e-6)
