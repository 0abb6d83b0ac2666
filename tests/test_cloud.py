"""Cloud container semantics ported from cloud_test.cc + extras."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcseg_tpu.ops import geom, plane_fit, seeds as seeds_op
from pcseg_tpu.utils import cloud as cloud_lib
from pcseg_tpu.utils import io
from pcseg_tpu import oracle


class TestLinearization:
    def test_truth_table(self):
        """cloud_test.cc:82-100 row/col-major linearization."""
        rows, cols = 3, 4
        # col-major (the reference default): idx = col*rows + row
        assert cloud_lib.linearize_index(0, 0, rows, cols) == 0
        assert cloud_lib.linearize_index(1, 0, rows, cols) == 1
        assert cloud_lib.linearize_index(0, 1, rows, cols) == 3
        assert cloud_lib.linearize_index(2, 3, rows, cols) == 11
        # row-major
        rm = cloud_lib.ROW_MAJOR
        assert cloud_lib.linearize_index(0, 1, rows, cols, rm) == 1
        assert cloud_lib.linearize_index(1, 0, rows, cols, rm) == 4
        assert cloud_lib.linearize_index(2, 3, rows, cols, rm) == 11

    def test_index_round_trip(self):
        """cloud_test.cc:102-113."""
        rows, cols = 5, 7
        for order in (cloud_lib.COL_MAJOR, cloud_lib.ROW_MAJOR):
            for idx in range(rows * cols):
                r, c = cloud_lib.index_to_row_col(idx, rows, cols, order)
                assert cloud_lib.linearize_index(r, c, rows, cols,
                                                 order) == idx

    def test_flatten_matches_linearization(self):
        rng = np.random.default_rng(0)
        grid = jnp.asarray(rng.normal(size=(3, 4, 2)).astype(np.float32))
        flat = np.asarray(cloud_lib.flatten_grid(grid))
        for r in range(3):
            for c in range(4):
                lin = cloud_lib.linearize_index(r, c, 3, 4)
                np.testing.assert_array_equal(flat[lin],
                                              np.asarray(grid)[r, c])
        back = np.asarray(cloud_lib.unflatten_grid(jnp.asarray(flat), 3, 4))
        np.testing.assert_array_equal(back, np.asarray(grid))

    def test_nan_inf_propagation(self):
        """cloud_test.cc:115-143 — special values survive storage."""
        pts = np.zeros((2, 2, 3), np.float32)
        pts[0, 0] = (np.nan, np.inf, -np.inf)
        c = cloud_lib.PointCloud(points=jnp.asarray(pts))
        got = np.asarray(c.points)[0, 0]
        assert np.isnan(got[0]) and np.isposinf(got[1]) \
            and np.isneginf(got[2])
        assert not bool(c.valid_mask()[0, 0])


class TestEstimatorProtoRoundTrip:
    def test_round_trip(self):
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(30, 3)).astype(np.float32)
        m = plane_fit.set_normal_orientation(
            plane_fit.empty(()), jnp.array([0.0, 0.0, 1.0]))
        m = plane_fit.add_points(m, jnp.asarray(pts))
        proto = io.plane_estimator_to_proto(m)
        back = io.plane_estimator_from_proto(proto)
        a, b = plane_fit.solve(m), plane_fit.solve(back)
        np.testing.assert_allclose(np.asarray(a.plane), np.asarray(b.plane),
                                   atol=1e-6)

    def test_merge_after_round_trip(self):
        """Serialized accumulators compose (the resume story)."""
        rng = np.random.default_rng(2)
        pts = rng.normal(size=(40, 3)).astype(np.float32)
        m1 = plane_fit.add_points(plane_fit.empty(()), jnp.asarray(pts[:20]))
        m2 = plane_fit.add_points(plane_fit.empty(()), jnp.asarray(pts[20:]))
        m2b = io.plane_estimator_from_proto(io.plane_estimator_to_proto(m2))
        merged = plane_fit.merge(m1, m2b)
        joint = plane_fit.add_points(plane_fit.empty(()), jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(merged.s2),
                                   np.asarray(joint.s2), rtol=1e-5)


class TestTemporalSeeds:
    def test_matches_reference_semantics(self):
        """FindSeedPointsFromLastPlanarRegions (planar_region.h:478-519)."""
        from tests import fixtures
        pts, origin = fixtures.synthetic_room_cloud(32, 40, f=32.0, seed=4)
        normals = oracle.compute_normals_organized(pts, origin)

        # two fake previous regions: near the floor and near the wall
        prev_centroids = jnp.asarray([[2.0, 0.0, -1.0], [4.0, 0.0, 0.5]])
        prev_normals = jnp.asarray([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0]])
        prev_counts = jnp.asarray([500, 100], jnp.int32)
        prev_valid = jnp.asarray([True, True])
        idx, found = seeds_op.seeds_from_last_regions(
            jnp.asarray(pts), jnp.asarray(normals), prev_centroids,
            prev_normals, prev_counts, prev_valid, geom.Pose(),
            max_distance=1.0, max_normal_difference_angle=0.3)
        idx = np.asarray(idx)
        found = np.asarray(found)
        assert found.all()
        # order: ascending count -> wall region (100) first
        h = 32
        for k, (c, n) in enumerate([([4.0, 0.0, 0.5], [-1, 0, 0]),
                                    ([2.0, 0.0, -1.0], [0, 0, 1])]):
            r, col = int(idx[k]) % h, int(idx[k]) // h
            p = pts[r, col]
            assert np.linalg.norm(p - np.asarray(c)) < 1.0
            assert normals[r, col] @ np.asarray(n) > np.cos(0.3)

    def test_not_found_when_out_of_range(self):
        from tests import fixtures
        pts, origin = fixtures.synthetic_room_cloud(24, 24, f=24.0, seed=4)
        normals = oracle.compute_normals_organized(pts, origin)
        idx, found = seeds_op.seeds_from_last_regions(
            jnp.asarray(pts), jnp.asarray(normals),
            jnp.asarray([[100.0, 100.0, 100.0]]),
            jnp.asarray([[0.0, 0.0, 1.0]]),
            jnp.asarray([10], jnp.int32), jnp.asarray([True]),
            geom.Pose(), 1.0, 0.3)
        assert not bool(found[0])
