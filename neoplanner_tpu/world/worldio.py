"""Gazebo ``.world`` (SDF) asset interchange: parse box scenes, write box scenes.

The reference ships its obstacle courses as Gazebo SDF worlds
(/root/reference/src/simulator/worlds/*.world, produced by
generate_worlds.py:148-185: box sizes live on the ``<world>``-level models, poses on
the ``<state>``-level models of the same name). This module reads those assets into
:class:`BoxWorld` arrays so the reference worlds run unchanged on the TPU stack, and
writes minimal SDF worlds back out in the same schema.

Host-side, numpy only — this is I/O, not compute.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np
import jax.numpy as jnp

from neoplanner_tpu.core.types import SHAPE_BOX, SHAPE_CYLINDER, BoxWorld


# Mesh obstacles (forest.world's pine trees, model://pine_tree) become TWO
# stacked cylinders: a trunk plus a canopy. The checkout carries no oracle to
# calibrate against — there is no forest.bt/.pcd (only poles has baked maps)
# and pine_tree.dae itself is an external Gazebo asset absent from the repo —
# so the dimensions below come from the standard OSRF pine_tree model (~10 m
# tall, ~0.3 m trunk, conical canopy a few meters wide). What matters for
# parity is that the occupancy slice z in [1.8, 10] (map_server_onboard.
# launch:30-32) intersects the CANOPY, not just the trunk: round 1's single
# r=0.4 cylinder under-filled the projected map that both the depth camera
# and the octomap rasterizer would see.
_TREE_TRUNK_RADIUS = 0.35
_TREE_HEIGHT = 10.0
_TREE_CANOPY_RADIUS = 1.6     # effective footprint of the cone in the slice
_TREE_CANOPY_Z = (1.0, 9.0)   # canopy extent above the model origin


def _find_geometry(model: ET.Element):
    """Return a list of (shape, half_sizes, z_offset) primitives from a model's
    first box/cylinder/mesh geometry. z_offset shifts the primitive center
    above the model pose (SDF tree models are rooted at ground level)."""
    size_el = model.find(".//box/size")
    if size_el is not None and size_el.text is not None:
        vals = [float(v) for v in size_el.text.split()]
        return [(SHAPE_BOX, np.array(vals[:3]) / 2, 0.0)]
    cyl = model.find(".//cylinder")
    if cyl is not None:
        radius = float(cyl.findtext("radius", default="0.5"))
        length = float(cyl.findtext("length", default="1.0"))
        return [(SHAPE_CYLINDER, np.array([radius, radius, length / 2]), 0.0)]
    if model.find(".//mesh") is not None:
        trunk_half = _TREE_HEIGHT / 2
        cz0, cz1 = _TREE_CANOPY_Z
        canopy_half = (cz1 - cz0) / 2
        return [
            (SHAPE_CYLINDER, np.array([_TREE_TRUNK_RADIUS, _TREE_TRUNK_RADIUS,
                                       trunk_half]), trunk_half),
            (SHAPE_CYLINDER, np.array([_TREE_CANOPY_RADIUS,
                                       _TREE_CANOPY_RADIUS, canopy_half]),
             cz0 + canopy_half),
        ]
    return []


def parse_world(path: str, max_boxes: int | None = 64) -> BoxWorld:
    """Read a reference-format .world into a BoxWorld (axis-aligned footprint;
    the reference's boxes carry negligible yaw from physics settling).

    ``max_boxes=None`` sizes the capacity to the parsed primitive count
    (rounded up to a multiple of 8), so large worlds never fail the cap."""
    tree = ET.parse(path)
    world = tree.getroot().find("world")
    if world is None:
        raise ValueError(f"{path}: no <world> element")

    prims = {}   # model name -> [(shape, half, z_offset), ...]
    for model in world.findall("model"):
        name = model.attrib.get("name", "")
        if name == "ground_plane":
            continue
        found = _find_geometry(model)
        if found:
            prims[name] = found

    poses = {}
    state = world.find("state")
    if state is not None:
        for model in state.findall("model"):
            name = model.attrib.get("name", "")
            if name == "ground_plane" or name not in prims:
                continue
            pose_el = model.find("pose")
            if pose_el is None or pose_el.text is None:
                continue
            vals = [float(v) for v in pose_el.text.split()]
            poses[name] = np.array(vals[:3])

    names = [n for n in prims if n in poses]
    total = sum(len(prims[n]) for n in names)
    if max_boxes is None:
        max_boxes = max((total + 7) // 8 * 8, 8)
    if total > max_boxes:
        # silently dropping geometry would make collision scoring lie about the
        # world (round 2 lost forest.world's last trees this way) — fail loud
        raise ValueError(
            f"{path}: {total} primitives exceed max_boxes={max_boxes}; "
            f"pass max_boxes>={total} (or max_boxes=None to auto-size)")
    K = max_boxes
    centers = np.zeros((K, 3), dtype=np.float32)
    half = np.full((K, 3), 0.01, dtype=np.float32)
    active = np.zeros(K, dtype=bool)
    shape = np.zeros(K, dtype=np.int32)
    i = 0
    for n in names:
        for (sh, hs, z_off) in prims[n]:
            centers[i] = poses[n] + np.array([0.0, 0.0, z_off])
            half[i] = hs
            active[i] = True
            shape[i] = sh
            i += 1
    return BoxWorld(centers=jnp.array(centers), half_sizes=jnp.array(half),
                    active=jnp.array(active), shape=jnp.array(shape))


_WORLD_TEMPLATE = """<?xml version="1.0"?>
<sdf version="1.6">
  <world name="default">
    <include><uri>model://ground_plane</uri></include>
    <include><uri>model://sun</uri></include>
{models}
    <state world_name="default">
{states}
    </state>
  </world>
</sdf>
"""

_MODEL_TEMPLATE = """    <model name="{name}">
      <static>true</static>
      <link name="link">
        <collision name="collision">
          <geometry>{geom}</geometry>
        </collision>
        <visual name="visual">
          <geometry>{geom}</geometry>
        </visual>
      </link>
    </model>"""

_STATE_TEMPLATE = """      <model name="{name}">
        <pose>{x} {y} {z} 0 0 0</pose>
        <link name="link"><pose>{x} {y} {z} 0 0 0</pose></link>
      </model>"""


def write_world(world: BoxWorld, path: str) -> None:
    """Write a BoxWorld as a minimal SDF world in the reference's schema
    (sizes on world models, poses on state models — generate_worlds.py:148-185)."""
    centers = np.asarray(world.centers)
    half = np.asarray(world.half_sizes)
    active = np.asarray(world.active)
    shape = np.asarray(world.shape)
    models, states = [], []
    for i in range(len(active)):
        if not active[i]:
            continue
        name = f"model{len(models)}"
        x, y, z = centers[i].tolist()
        if shape[i] == SHAPE_CYLINDER:
            geom = (f"<cylinder><radius>{half[i, 0]}</radius>"
                    f"<length>{half[i, 2] * 2}</length></cylinder>")
        else:
            sx, sy, sz = (half[i] * 2).tolist()
            geom = f"<box><size>{sx} {sy} {sz}</size></box>"
        models.append(_MODEL_TEMPLATE.format(name=name, geom=geom))
        states.append(_STATE_TEMPLATE.format(name=name, x=x, y=y, z=z))
    with open(path, "w") as f:
        f.write(_WORLD_TEMPLATE.format(models="\n".join(models),
                                       states="\n".join(states)))
