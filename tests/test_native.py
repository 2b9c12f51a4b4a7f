"""Native C++ graph segmentation (pointseg replacement)."""

import numpy as np
import pytest

from pointcept_keypointdetection_tpu.ops.native import segment_graph, segment_point


def test_segment_graph_two_components():
    # two cliques connected by one heavy edge
    edges, weights = [], []
    for c, base in enumerate((0, 5)):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
                weights.append(0.01)
    edges.append((0, 5))
    weights.append(10.0)
    labels = segment_graph(10, np.array(edges), np.array(weights, np.float32), k=0.1, min_size=1)
    assert len(np.unique(labels)) == 2
    assert len(np.unique(labels[:5])) == 1
    assert len(np.unique(labels[5:])) == 1
    assert labels[0] != labels[5]


def test_segment_point_planes(rng):
    # two perpendicular planes -> two segments
    n = 300
    p1 = np.stack([rng.uniform(0, 1, n), rng.uniform(0, 1, n), np.zeros(n)], 1)
    n1 = np.tile([0.0, 0, 1], (n, 1))
    p2 = np.stack([rng.uniform(0, 1, n), np.full(n, 1.0), rng.uniform(0.02, 1, n)], 1)
    n2 = np.tile([0.0, 1, 0], (n, 1))
    coord = np.concatenate([p1, p2]).astype(np.float32)
    normal = np.concatenate([n1, n2]).astype(np.float32)
    labels = segment_point(coord, normal, knn=8, k=0.05, min_size=10)
    # the dominant label of each plane should differ
    d1 = np.bincount(labels[:n]).argmax()
    d2 = np.bincount(labels[n:]).argmax()
    assert d1 != d2


def test_min_size_merging():
    # a chain with a tiny appendix gets merged when min_size is large
    edges = np.array([(0, 1), (1, 2), (2, 3), (3, 4)])
    weights = np.array([0.01, 0.01, 5.0, 0.01], np.float32)
    labels_small = segment_graph(5, edges, weights, k=0.1, min_size=1)
    assert labels_small[2] != labels_small[3]
    labels_merged = segment_graph(5, edges, weights, k=0.1, min_size=3)
    assert len(np.unique(labels_merged)) == 1
