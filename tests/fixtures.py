"""Synthetic clouds ported from the reference's C++ test fixtures.

Each builder cites the test it mirrors so goldens stay traceable.
"""

from __future__ import annotations

import numpy as np

from pcseg_tpu.models.config import UNLABELED
from pcseg_tpu.oracle import lin


def clustering_fixture_cloud(size: int = 10) -> np.ndarray:
    """The handcrafted 10x10 cluster cloud of clustering_test.cc:53-113.

    Returns [H, W, 3] float32: regular clusters, a straight line, a curved
    line, a roof point, >10 m outliers.
    """
    points = np.zeros((size, size, 3), np.float32)
    for col in range(size):
        for row in range(size):
            if col < size // 2 - 1:
                if row < size // 2 - 1:
                    points[row, col] = (0.05 * col + 2.0, 0.05 * row + 2.0, 2.0)
                elif row > size // 2 - 1:
                    points[row, col] = (0.05 * col, 0.05 * row + 2.0, 0.0)
                else:
                    points[row, col] = (0.05 * col, 0.05 * row + 2.0, 1.0)
                continue
            if col == size // 2 - 1:
                points[row, col] = (0.1 * col, 0.0, 0.1 * row)
                continue
            if row + col == size or row + col == size - 1:
                points[row, col] = (0.05 * col + 5.0, -0.05 * row - 2.0,
                                    2.0 - 0.05 * row)
            elif row == size - 2 and col == size - 2:
                points[row, col] = (0.05 * col + 2.0, -0.05 * row - 2.0, 4.0)
            elif row in (size - 4, size - 3) and col == size - 2:
                points[row, col] = (6.0, 8.0, 2.0)
            else:
                points[row, col] = (0.05 * col + 2.0, -0.05 * row - 2.0,
                                    2.0 - 0.05 * row)
    return points


def clustering_fixture_seeds(size: int = 10) -> list:
    """Seed order of clustering_test.cc:56-59: the driver pops back-to-front,
    so this ordering makes it process linear index 0 first."""
    seeds = [0] * (size * size)
    for col in range(size):
        for row in range(size):
            index = lin(row, col, size)
            seeds[size * size - 1 - index] = index
    return seeds


# Expected label grid (clustering_test.cc:127-137) with initial_id_offset=1.
CLUSTERING_EXPECTED_LABELS = np.array([
    [1, 1, 1, 1, 3, 4, 4, 4, 4, 5],
    [1, 1, 1, 1, 3, 4, 4, 4, 5, 5],
    [1, 1, 1, 1, 3, 4, 4, 5, 5, 6],
    [1, 1, 1, 1, 3, 4, 5, 5, 6, 6],
    [-1, -1, -1, -1, 3, 5, 5, 6, 6, 6],
    [2, 2, 2, 2, 3, 5, 6, 6, 6, 6],
    [2, 2, 2, 2, 3, 6, 6, 6, -1, 6],
    [2, 2, 2, 2, 3, 6, 6, 6, -1, 6],
    [2, 2, 2, 2, 3, 6, 6, 6, -1, 6],
    [2, 2, 2, 2, 3, 6, 6, 6, 6, 6],
], np.int32)

# clustering_test.cc:146
CLUSTERING_EXPECTED_SIZES = [16, 20, 10, 10, 10, 27]


def flat_grid_fixture(size: int = 5):
    """segmentation_test.cc:28-44: flat z=0 grid with +z normals."""
    points = np.zeros((size, size, 3), np.float32)
    normals = np.zeros((size, size, 3), np.float32)
    for col in range(size):
        for row in range(size):
            points[row, col] = (0.1 * col, 0.1 * row, 0.0)
            normals[row, col] = (0.0, 0.0, 1.0)
    return points, normals


# Scene generators live in the package so benchmarks and the graft entry can
# use them too.
from pcseg_tpu.utils.synthetic import (  # noqa: E402,F401
    analytic_plane_cloud, synthetic_room_cloud)
