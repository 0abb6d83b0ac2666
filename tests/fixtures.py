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


def analytic_plane_cloud(nx=200, ny=200, normal=(0.0, 0.0, 1.0), d=-1.0,
                         step=0.01, noise=0.0, seed=0):
    """Grid of points on plane n.x + d = 0 (plane_estimator_test.cc style)."""
    rng = np.random.default_rng(seed)
    n = np.asarray(normal, np.float64)
    n = n / np.linalg.norm(n)
    # basis in plane
    helper = np.array([1.0, 0.0, 0.0]) if abs(n[0]) < 0.9 \
        else np.array([0.0, 1.0, 0.0])
    u = np.cross(helper, n)
    u /= np.linalg.norm(u)
    v = np.cross(n, u)
    origin = -d * n
    xs = (np.arange(nx) - nx / 2) * step
    ys = (np.arange(ny) - ny / 2) * step
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = (origin[None, None]
           + gx[..., None] * u[None, None]
           + gy[..., None] * v[None, None])
    if noise:
        pts = pts + rng.normal(0, noise, pts.shape) * n[None, None]
    return pts.astype(np.float32)


def synthetic_room_cloud(rows=120, cols=160, f=120.0, seed=0,
                         with_nan_holes=True):
    """Depth-camera style organized cloud of a room: floor plane, one wall,
    a table slab, plus random NaN holes. Camera at origin looking +x with
    z up. Returns ([H, W, 3] points, sensor_origin)."""
    rng = np.random.default_rng(seed)
    cy, cz = rows / 2.0, cols / 2.0
    pts = np.full((rows, cols, 3), np.nan, np.float32)
    for r in range(rows):
        for c in range(cols):
            # ray direction in camera frame: x forward, y left, z up
            dy = (c - cz) / f
            dz = (cy - r) / f
            d = np.array([1.0, dy, dz])
            d /= np.linalg.norm(d)
            # intersect with floor z = -1.0
            ts = []
            if d[2] < -1e-6:
                ts.append((-1.0 - 0.0) / d[2])
            # wall x = 4.0
            if d[0] > 1e-6:
                ts.append(4.0 / d[0])
            # table slab z = -0.6 for 1.5 < x < 2.5
            if d[2] < -1e-6:
                t = -0.6 / d[2]
                p = t * d
                if 1.5 < p[0] < 2.5 and -0.8 < p[1] < 0.8:
                    ts.append(t)
            if not ts:
                continue
            t = min(t for t in ts if t > 0.1)
            pts[r, c] = (t * d).astype(np.float32)
    if with_nan_holes:
        holes = rng.random((rows, cols)) < 0.02
        pts[holes] = np.nan
    return pts, np.zeros(3, np.float32)
