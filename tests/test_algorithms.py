"""Geometry toolbox tests ported from algorithms_test.cc."""

import numpy as np
import jax.numpy as jnp

from pcseg_tpu.ops import polygon, registration
from pcseg_tpu.utils import hostgeom


ZIGZAG = np.array([
    [0.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.1, 0.0],
    [-1.0, 1.0, 0.0], [2.0, 0.0, 0.0], [1.0, 0.8, 0.0],
], np.float32)
ZIGZAG_POLY = [0, 3, 2, 1, 4, 5]


class TestPointInTriangle:
    def test_clockwise(self):
        """algorithms_test.cc:41-60."""
        u, v, w = (np.zeros(3), np.array([1.0, 0, 0]),
                   np.array([1.0, -1.0, 0]))
        assert hostgeom.is_inside_triangle(u, v, w, [0.2, -0.1, 0.0])
        assert hostgeom.is_inside_triangle(u, v, w, [0.2, -0.1, 1.0])
        assert hostgeom.is_inside_triangle(u, v, w, [0.2, -0.1, -1.0])
        assert not hostgeom.is_inside_triangle(u, v, w, [0.2, 0.1, -1.0])
        assert not hostgeom.is_inside_triangle(u, v, w, [1.1, -0.1, -1.0])
        assert not hostgeom.is_inside_triangle(u, v, w, [0.1, -0.2, -1.0])

    def test_counterclockwise_batched_device(self):
        """algorithms_test.cc:62-81 via the batched jnp op."""
        u = jnp.zeros((6, 3))
        v = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (6, 1))
        w = jnp.tile(jnp.array([1.0, 1.0, 0.0]), (6, 1))
        p = jnp.array([
            [0.2, 0.1, 0.0], [0.2, 0.1, 1.0], [0.2, 0.1, -1.0],
            [0.2, -0.1, -1.0], [1.1, 0.1, -1.0], [0.1, 0.2, -1.0]])
        got = np.asarray(polygon.is_inside_triangle(u, v, w, p))
        np.testing.assert_array_equal(got, [True, True, True,
                                            False, False, False])


class TestEar:
    def test_zigzag_cases(self):
        """algorithms_test.cc:83-115."""
        normal = hostgeom.cumulative_polygon_normal(
            ZIGZAG[ZIGZAG_POLY]).astype(np.float64)
        cases = [
            ((0, 1, 2), True), ((1, 2, 3), False), ((2, 3, 4), False),
            ((3, 4, 5), True), ((4, 5, 0), False), ((5, 0, 1), False),
            ((0, 2, 3), True), ((2, 3, 0), True), ((2, 3, 5), True),
            ((5, 0, 2), True),
        ]
        for (u, v, w), expect in cases:
            got = hostgeom._is_ear(ZIGZAG, u, v, w, ZIGZAG_POLY, normal)
            assert got == expect, (u, v, w)


class TestPolygonNormalArea:
    def test_triangle(self):
        """algorithms_test.cc:117-140."""
        pts = np.array([[0, 0, 1000.0], [1, 1, 1000.0], [1, 0, 1000.0]],
                       np.float32)
        n = hostgeom.polygon_normal(pts)
        np.testing.assert_allclose(n, [0, 0, -1], atol=1e-5)
        assert abs(hostgeom.polygon_area(pts) - 0.5) < 1e-5
        # duplicate indices add zero area
        assert abs(hostgeom.polygon_area(pts[[0, 1, 2, 1, 2]]) - 0.5) < 1e-5

        pts2 = pts.copy()
        pts2[1] = (1.0, 0.0, 999.0)
        n = hostgeom.polygon_normal(pts2)
        np.testing.assert_allclose(n, [0, -1, 0], atol=1e-5)
        assert abs(hostgeom.polygon_area(pts2) - 0.5) < 1e-5

    def test_device_matches_host(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(12, 3)).astype(np.float32)
        host = hostgeom.polygon_area(pts)
        dev = float(polygon.polygon_area(jnp.asarray(pts)[None])[0])
        assert abs(host - dev) < 1e-4


class TestTriangulation:
    def _area_of_triangles(self, points, triangles):
        area = 0.0
        for i in range(0, len(triangles), 3):
            area += hostgeom.polygon_area(points[triangles[i:i + 3]])
        return area

    def test_loopy_zigzag(self):
        """algorithms_test.cc:142-184."""
        ok, tris = hostgeom.triangulate_loopy_polygon(ZIGZAG, ZIGZAG_POLY)
        assert ok
        assert len(tris) == (len(ZIGZAG) - 2) * 3
        assert abs(self._area_of_triangles(ZIGZAG, tris)
                   - hostgeom.polygon_area(ZIGZAG[ZIGZAG_POLY])) < 1e-5

        loopy = [0, 3, 2, 1, 4, 5, 4, 1, 4, 5]
        ok, tris = hostgeom.triangulate_loopy_polygon(ZIGZAG, loopy)
        assert ok
        assert len(tris) == (len(ZIGZAG) - 2) * 3
        assert abs(self._area_of_triangles(ZIGZAG, tris)
                   - hostgeom.polygon_area(ZIGZAG[loopy])) < 1e-5

    def test_real_14_point_case(self):
        """algorithms_test.cc:186-215."""
        pts = np.array([
            [1.77995, 5.67707, 0.00866], [1.71035, 5.36595, 0.00898],
            [1.64175, 5.06695, 0.00933], [2.11661, 5.73814, -0.00001],
            [2.02174, 5.40343, 0.00087], [1.94777, 5.13560, 0.00151],
            [1.86870, 4.85730, 0.00225], [1.45473, 4.22188, 0.01014],
            [1.49240, 4.39640, 0.01000], [1.54583, 4.62679, 0.00971],
            [1.59422, 4.84672, 0.00951], [1.64174, 5.06695, 0.00933],
            [1.71034, 5.36595, 0.00898], [1.33166, 4.81384, 0.01635],
        ], np.float32)
        poly = list(range(14))
        ok, tris = hostgeom.triangulate_polygon(pts, poly)
        assert ok
        assert len(tris) == (14 - 2) * 3
        assert abs(self._area_of_triangles(pts, tris)
                   - hostgeom.polygon_area(pts[poly])) < 1e-5


class TestRegistration:
    def _cloud(self, n=60, seed=4):
        rng = np.random.default_rng(seed)
        return rng.uniform(-2, 2, (n, 3)).astype(np.float32)

    def _rotation(self, angle=0.4):
        c, s = np.cos(angle), np.sin(angle)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    def test_nearest_neighbors(self):
        src = self._cloud(40)
        dest = self._cloud(50, seed=5)
        got = np.asarray(registration.nearest_neighbors(
            jnp.asarray(src), jnp.asarray(dest)))
        d2 = np.sum((src[:, None] - dest[None]) ** 2, axis=-1)
        np.testing.assert_array_equal(got, d2.argmin(axis=1))

    def test_rigid_transform_translation(self):
        src = self._cloud()
        t = np.array([1.0, -2.0, 3.0], np.float32)
        rt = registration.compute_rigid_transform(
            jnp.asarray(src), jnp.asarray(src + t))
        np.testing.assert_allclose(np.asarray(rt.rotation), np.eye(3),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(rt.translation), t, atol=1e-5)

    def test_rigid_transform_rotation_translation(self):
        src = self._cloud()
        r = self._rotation()
        t = np.array([0.5, 0.25, -1.0], np.float32)
        dest = src @ r.T + t
        rt = registration.compute_rigid_transform(
            jnp.asarray(src), jnp.asarray(dest))
        np.testing.assert_allclose(np.asarray(rt.rotation), r, atol=1e-4)
        np.testing.assert_allclose(np.asarray(rt.translation), t, atol=1e-4)
        np.testing.assert_allclose(np.asarray(rt.apply(jnp.asarray(src))),
                                   dest, atol=1e-4)

    def test_icp_identity(self):
        src = self._cloud()
        res = registration.iterative_closest_point(
            jnp.asarray(src), jnp.asarray(src))
        assert float(res.mean_error) < 1e-4
        np.testing.assert_allclose(np.asarray(res.transform.rotation),
                                   np.eye(3), atol=1e-4)

    def test_icp_shuffled_translated(self):
        rng = np.random.default_rng(8)
        src = self._cloud(80)
        t = np.array([0.05, -0.04, 0.06], np.float32)
        dest = (src + t)[rng.permutation(80)]
        res = registration.iterative_closest_point(
            jnp.asarray(src), jnp.asarray(dest))
        assert float(res.mean_error) < 1e-3
        np.testing.assert_allclose(np.asarray(res.transform.translation), t,
                                   atol=1e-3)


class TestRegistrationDouble:
    """Double-precision Kabsch/ICP parity (algorithms_test.cc:406-428 runs
    the typed rigid-transform suite at double); under jax x64 the same ops
    must recover transforms to double-precision tolerances."""

    def _cloud64(self, n=60, seed=11):
        rng = np.random.default_rng(seed)
        return rng.uniform(-2, 2, (n, 3)).astype(np.float64)

    def test_rigid_transform_double(self):
        import jax
        with jax.enable_x64():
            src = self._cloud64()
            angle = 0.3
            c, s = np.cos(angle), np.sin(angle)
            r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)
            t = np.array([0.1, -0.7, 2.0], np.float64)
            dest = src @ r.T + t
            rt = registration.compute_rigid_transform(
                jnp.asarray(src, jnp.float64), jnp.asarray(dest, jnp.float64))
            assert np.asarray(rt.rotation).dtype == np.float64
            np.testing.assert_allclose(np.asarray(rt.rotation), r, atol=1e-9)
            np.testing.assert_allclose(np.asarray(rt.translation), t,
                                       atol=1e-9)

    def test_icp_double(self):
        import jax
        with jax.enable_x64():
            rng = np.random.default_rng(12)
            src = self._cloud64(80)
            t = np.array([0.05, -0.04, 0.06], np.float64)
            dest = (src + t)[rng.permutation(80)]
            res = registration.iterative_closest_point(
                jnp.asarray(src, jnp.float64), jnp.asarray(dest, jnp.float64))
            assert float(res.mean_error) < 1e-8
            np.testing.assert_allclose(np.asarray(res.transform.translation),
                                       t, atol=1e-8)
