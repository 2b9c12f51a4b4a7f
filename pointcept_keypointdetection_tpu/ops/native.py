"""ctypes bindings for the native C++ ops (csrc/).

Parity surface: `libs/pointseg` (`pointseg/functions.py:6-36` segment_mesh /
segment_point over the C++ Felzenszwalb segmentor).  The shared library is
compiled on first use with the system compiler and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libpointseg.so")
_lib: Optional[ctypes.CDLL] = None


def _build_library():
    src = os.path.join(_CSRC, "pointseg.cpp")
    for cc in ("c++", "g++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", _LIB_PATH],
                check=True,
                capture_output=True,
            )
            return
        except (FileNotFoundError, subprocess.CalledProcessError):
            continue
    raise RuntimeError("no working C++ compiler for csrc/pointseg.cpp")


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_CSRC, "pointseg.cpp")
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
        _build_library()
    _lib = ctypes.CDLL(_LIB_PATH)
    _lib.segment_graph.restype = ctypes.c_int32
    _lib.segment_graph.argtypes = [
        ctypes.c_int32,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_float,
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    return _lib


def segment_graph(
    num_vertices: int,
    edges: np.ndarray,  # int[E, 2]
    weights: np.ndarray,  # float[E]
    k: float = 0.01,
    min_size: int = 20,
) -> np.ndarray:
    """Felzenszwalb segmentation of a weighted graph -> int32[num_vertices] labels."""
    lib = _load()
    edges = np.ascontiguousarray(edges, np.int32)
    weights = np.ascontiguousarray(weights, np.float32)
    labels = np.zeros(num_vertices, np.int32)
    lib.segment_graph(
        np.int32(num_vertices),
        np.int64(len(weights)),
        np.ascontiguousarray(edges[:, 0]),
        np.ascontiguousarray(edges[:, 1]),
        weights,
        np.float32(k),
        np.int32(min_size),
        labels,
    )
    return labels


def segment_mesh(vertices: np.ndarray, faces: np.ndarray, k: float = 0.01, min_size: int = 20):
    """Oversegment a mesh: edge weight = 1 - |n_a . n_b| dihedral-style metric
    (matches pointseg's normal-difference weighting)."""
    # vertex normals from faces
    a = vertices[faces[:, 1]] - vertices[faces[:, 0]]
    b = vertices[faces[:, 2]] - vertices[faces[:, 0]]
    fn = np.cross(a, b)
    vn = np.zeros_like(vertices)
    for i in range(3):
        np.add.at(vn, faces[:, i], fn)
    vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-8)

    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
    w = 1.0 - np.abs(np.sum(vn[edges[:, 0]] * vn[edges[:, 1]], axis=1))
    return segment_graph(len(vertices), edges, w.astype(np.float32), k, min_size)


def segment_point(coord: np.ndarray, normal: np.ndarray, knn: int = 10, k: float = 0.01, min_size: int = 20):
    """Oversegment a point cloud over its knn graph."""
    from scipy.spatial import cKDTree

    tree = cKDTree(coord)
    _, idx = tree.query(coord, k=min(knn + 1, len(coord)))
    src = np.repeat(np.arange(len(coord)), idx.shape[1] - 1)
    dst = idx[:, 1:].reshape(-1)
    w = 1.0 - np.abs(np.sum(normal[src] * normal[dst], axis=1))
    edges = np.stack([src, dst], axis=1)
    return segment_graph(len(coord), edges, w.astype(np.float32), k, min_size)
