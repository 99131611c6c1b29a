"""ctypes binding of the native octomap .bt / PCL .pcd codec.

Loads the reference's shipped ground-truth map assets
(/root/reference/src/simulator/worlds/poles.{bt,pcd}) and writes compatible
files for our generated worlds (the interchange the reference's map-building
workflow produces via plugin_build_octomap.cpp:104-146). The shared library
builds on first use with the system g++ (see octomap_cc/Makefile).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_CC_DIR = os.path.join(os.path.dirname(__file__), "octomap_cc")
_LIB_PATH = os.path.join(_CC_DIR, "liboctomap_codec.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_CC_DIR, "octomap_codec.cc"))):
        subprocess.run(["make", "-C", _CC_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.bt_read.restype = ctypes.c_void_p
    lib.bt_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_double)]
    lib.bt_get_leaves.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_void_p, ctypes.c_void_p]
    lib.bt_free.argtypes = [ctypes.c_void_p]
    lib.bt_write.restype = ctypes.c_int
    lib.bt_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int,
                             ctypes.c_int, ctypes.c_int, ctypes.c_double,
                             ctypes.c_double, ctypes.c_double, ctypes.c_double]
    lib.pcd_read.restype = ctypes.c_void_p
    lib.pcd_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    lib.pcd_get_points.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.pcd_free.argtypes = [ctypes.c_void_p]
    lib.pcd_write.restype = ctypes.c_int
    lib.pcd_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int,
                              ctypes.c_int]
    _lib = lib
    return lib


def read_bt(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Read a .bt octree -> (centers (N, 3), half_sizes (N,), occupied (N,) bool,
    resolution). Leaves of all sizes are returned; occupied leaves above the
    finest resolution cover multiple voxels."""
    lib = _load()
    n = ctypes.c_int(0)
    res = ctypes.c_double(0.0)
    h = lib.bt_read(path.encode(), ctypes.byref(n), ctypes.byref(res))
    if not h:
        raise IOError(f"failed to read octomap .bt file: {path}")
    centers = np.zeros((n.value, 3), dtype=np.float32)
    half = np.zeros(n.value, dtype=np.float32)
    occ = np.zeros(n.value, dtype=np.uint8)
    lib.bt_get_leaves(h, centers.ctypes.data, half.ctypes.data, occ.ctypes.data)
    lib.bt_free(h)
    return centers, half, occ.astype(bool), res.value


def bt_to_voxels(path: str) -> Tuple[np.ndarray, float]:
    """Occupied voxel centers at the finest resolution: (M, 3), resolution.
    Coarse occupied leaves are expanded into their constituent voxels."""
    centers, half, occ, res = read_bt(path)
    out = []
    for c, h in zip(centers[occ], half[occ]):
        k = max(int(round(2 * h / res)), 1)
        if k == 1:
            out.append(c[None, :])
        else:
            offs = (np.arange(k) + 0.5) * res - h
            gx, gy, gz = np.meshgrid(offs, offs, offs, indexing="ij")
            grid = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
            out.append(c[None, :] + grid)
    if not out:
        return np.zeros((0, 3), np.float32), res
    return np.concatenate(out).astype(np.float32), res


def bt_to_grid(path: str, origin, shape, res_override=None
               ) -> Tuple[np.ndarray, float]:
    """Rasterize a .bt file into a dense (Z, H, W) occupancy grid with the given
    world origin (x0, y0, z0) and shape (nz, ny, nx)."""
    voxels, res = bt_to_voxels(path)
    if res_override:
        res = res_override
    nz, ny, nx = shape
    grid = np.zeros(shape, dtype=np.float32)
    if len(voxels):
        idx = np.floor((voxels - np.asarray(origin)[None, ::-1][:, ::-1])
                       / res).astype(int)
        ix, iy, iz = idx[:, 0], idx[:, 1], idx[:, 2]
        ok = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
              & (iz >= 0) & (iz < nz))
        grid[iz[ok], iy[ok], ix[ok]] = 1.0
    return grid, res


def write_bt(path: str, grid: np.ndarray, resolution: float, origin) -> None:
    """Write a dense (Z, H, W) {0,1} grid as a .bt octree. origin = world
    coordinates of the grid's (x0, y0, z0) corner."""
    lib = _load()
    g = np.ascontiguousarray(grid.astype(np.uint8))
    nz, ny, nx = g.shape
    rc = lib.bt_write(path.encode(), g.ctypes.data, nx, ny, nz,
                      float(resolution), float(origin[0]), float(origin[1]),
                      float(origin[2]))
    if rc != 0:
        raise IOError(f"failed to write octomap .bt file: {path}")


def read_pcd(path: str) -> np.ndarray:
    """(N, 3) float32 points (ascii or binary PCD, x/y/z fields)."""
    lib = _load()
    n = ctypes.c_int(0)
    h = lib.pcd_read(path.encode(), ctypes.byref(n))
    if not h:
        raise IOError(f"failed to read .pcd file: {path}")
    pts = np.zeros((n.value, 3), dtype=np.float32)
    lib.pcd_get_points(h, pts.ctypes.data)
    lib.pcd_free(h)
    return pts


def write_pcd(path: str, points: np.ndarray, ascii_mode: bool = True) -> None:
    lib = _load()
    pts = np.ascontiguousarray(points.astype(np.float32))
    rc = lib.pcd_write(path.encode(), pts.ctypes.data, len(pts),
                       1 if ascii_mode else 0)
    if rc != 0:
        raise IOError(f"failed to write .pcd file: {path}")
