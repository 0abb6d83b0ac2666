"""JAX core math vs oracle/analytic goldens (CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcseg_tpu.ops import geom, plane_fit
from pcseg_tpu import oracle
from tests import fixtures


def random_spd_batch(n, seed=0, rank=None):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, 3, 3))
    if rank is not None:
        a[..., :, rank:] = 0.0
    return (a @ np.swapaxes(a, -1, -2)).astype(np.float32)


class TestEigh3x3:
    def test_eigenvalues_match_numpy(self):
        covs = random_spd_batch(256, seed=1)
        evals, vecs = jax.jit(geom.eigh3x3_smallest)(jnp.asarray(covs))
        expected = np.linalg.eigvalsh(covs.astype(np.float64))
        # f32 closed form: error scales with the matrix norm, so compare
        # against a per-matrix absolute tolerance.
        scale = np.abs(expected).max(axis=-1, keepdims=True)
        err = np.abs(np.asarray(evals) - expected)
        assert np.all(err <= 1e-5 + 1e-5 * scale)

    def test_smallest_eigenvector(self):
        covs = random_spd_batch(256, seed=2)
        _, vecs = jax.jit(geom.eigh3x3_smallest)(jnp.asarray(covs))
        w, v = np.linalg.eigh(covs.astype(np.float64))
        expect = v[..., :, 0]
        got = np.asarray(vecs, np.float64)
        # sign-invariant comparison
        dots = np.abs(np.sum(expect * got, axis=-1))
        assert np.all(dots > 1 - 1e-3)

    def test_matches_oracle_closed_form(self):
        covs = random_spd_batch(64, seed=3)
        evals, _ = geom.eigh3x3_smallest(jnp.asarray(covs))
        for i in range(len(covs)):
            expect = oracle.eig3x3_roots_f32(covs[i])
            np.testing.assert_allclose(np.asarray(evals[i]), expect,
                                       rtol=1e-3, atol=1e-5)

    def test_orientation_hint(self):
        covs = random_spd_batch(32, seed=4)
        hint = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (32, 1))
        _, vecs = geom.eigh3x3_smallest(jnp.asarray(covs), jnp.asarray(hint))
        assert np.all(np.asarray(vecs)[:, 2] >= 0)

    def test_dyadic_exact_degenerate(self):
        """The collinear corner case must produce lambda_1 exactly <= FLT_MIN
        (plane_estimator_test.cc:110-121)."""
        pts = np.array([[1, 2, 3], [1, 2, 3], [1, 2, 3], [0, 2, 3]],
                       np.float32)
        m = plane_fit.add_points(plane_fit.empty(()), jnp.asarray(pts))
        sol = plane_fit.solve(m)
        assert not bool(sol.valid)


class TestPlaneFit:
    def test_analytic_plane(self):
        pts = fixtures.analytic_plane_cloud(60, 60, normal=(1, 2, 3), d=-2.0)
        m = plane_fit.empty(())
        m = plane_fit.set_normal_orientation(
            m, jnp.array([1.0, 2.0, 3.0], jnp.float32))
        m = plane_fit.add_points(m, jnp.asarray(pts.reshape(-1, 3)))
        sol = jax.jit(plane_fit.solve)(m)
        n_expect = np.array([1.0, 2.0, 3.0]) / np.sqrt(14)
        assert bool(sol.valid)
        np.testing.assert_allclose(np.asarray(sol.normal), n_expect,
                                   atol=1e-4)
        assert abs(float(sol.plane[3]) + 2.0) < 1e-3

    def test_matches_oracle_estimator(self):
        rng = np.random.default_rng(7)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        pts[:, 2] *= 0.01
        est = oracle.PlaneEstimatorOracle()
        est.set_normal_orientation(np.array([0, 0, 1], np.float32))
        for p in pts:
            est.add_point(p)
        m = plane_fit.set_normal_orientation(
            plane_fit.empty(()), jnp.array([0.0, 0.0, 1.0]))
        m = plane_fit.add_points(m, jnp.asarray(pts))
        sol = plane_fit.solve(m)
        np.testing.assert_allclose(np.asarray(sol.plane), est.get_plane(),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(sol.centroid),
                                   est.get_centroid(), atol=1e-5)

    def test_merge_is_addition(self):
        rng = np.random.default_rng(8)
        pts = rng.normal(size=(40, 3)).astype(np.float32)
        m1 = plane_fit.add_points(plane_fit.empty(()), jnp.asarray(pts[:20]))
        m2 = plane_fit.add_points(plane_fit.empty(()), jnp.asarray(pts[20:]))
        joint = plane_fit.add_points(plane_fit.empty(()), jnp.asarray(pts))
        merged = plane_fit.merge(m1, m2)
        np.testing.assert_allclose(np.asarray(merged.s2),
                                   np.asarray(joint.s2), rtol=1e-5)
        sol_m = plane_fit.solve(merged)
        sol_j = plane_fit.solve(joint)
        np.testing.assert_allclose(np.asarray(sol_m.plane),
                                   np.asarray(sol_j.plane), atol=1e-5)

    def test_transform_merge_cross_frame(self):
        """AdvancedPlaneMerging (plane_estimator_test.cc:193-254): merge an
        estimator built in frame2 back into frame1 and recover the plane."""
        pts = np.array([
            [0, 0, 1.1], [0, 0, 0.9], [1, 0, 1.2], [1, 0, 0.8],
            [1, 1, 1.1], [1, 1, 0.9], [0, 1, 1.1], [0, 1, 0.9],
        ], np.float32)
        # frame2_pose_frame1: rot90 about x, translation (1,1,1)
        angle = np.pi / 2
        quat = jnp.array([np.cos(angle / 2), np.sin(angle / 2), 0.0, 0.0],
                         jnp.float32)
        pose21 = geom.Pose(quat, jnp.array([1.0, 1.0, 1.0], jnp.float32))
        pts2 = pose21.apply(jnp.asarray(pts))

        m1 = plane_fit.set_normal_orientation(
            plane_fit.empty(()), jnp.array([0.1, 0.1, 0.98]))
        m1 = plane_fit.add_points(m1, jnp.asarray(pts))
        m2 = plane_fit.set_normal_orientation(
            plane_fit.empty(()), jnp.array([0.1, -0.98, 0.1]))
        m2 = plane_fit.add_points(m2, pts2)

        m2_in_1 = plane_fit.transform(m2, pose21.inverse())
        merged = plane_fit.merge(m1, m2_in_1)
        sol = plane_fit.solve(merged)
        assert bool(sol.valid)
        np.testing.assert_allclose(np.asarray(sol.centroid), [0.5, 0.5, 1.0],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(sol.normal), [0.0, 0.0, 1.0],
                                   atol=1e-5)
        assert abs(float(sol.plane[3]) + 1.0) < 1e-5

    def test_weighted_outliers(self):
        """WeightedPlaneEstimation (plane_estimator_test.cc:168-191)."""
        pts = np.array([
            [0, 0, 1.1], [0, 0, 0.9], [1, 0, 1.2], [1, 0, 0.8],
            [1, 1, 1.1], [1, 1, 0.9], [0, 1, 1.1], [0, 1, 0.9],
            [4, 6, 7], [-6, 5, 8],
        ], np.float32)
        wts = np.array([1.0] * 8 + [0.001, 0.001], np.float32)
        m = plane_fit.set_normal_orientation(
            plane_fit.empty(()), jnp.array([0.1, 0.1, 0.98]))
        m = plane_fit.add_points(m, jnp.asarray(pts), jnp.asarray(wts))
        sol = plane_fit.solve(m)
        np.testing.assert_allclose(np.asarray(sol.normal), [0, 0, 1],
                                   atol=0.04)
        assert abs(float(sol.plane[3]) + 1.0) < 0.04


class TestPose:
    def test_compose_inverse(self):
        rng = np.random.default_rng(5)
        q = geom.quat_normalize(jnp.asarray(rng.normal(size=4),
                                            dtype=jnp.float32))
        pose = geom.Pose(q, jnp.asarray(rng.normal(size=3),
                                        dtype=jnp.float32))
        pts = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
        back = pose.inverse().apply(pose.apply(pts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                                   atol=1e-5)

    def test_rotation_matrix_roundtrip(self):
        rng = np.random.default_rng(6)
        q = geom.quat_normalize(jnp.asarray(rng.normal(size=4),
                                            dtype=jnp.float32))
        m = geom.quat_to_matrix(q)
        q2 = geom.matrix_to_quat(m)
        # q and -q are the same rotation
        assert (np.allclose(np.asarray(q), np.asarray(q2), atol=1e-5)
                or np.allclose(np.asarray(q), -np.asarray(q2), atol=1e-5))
