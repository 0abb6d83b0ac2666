"""Proto / npz round trips for the multichannel cloud."""

import numpy as np
import jax.numpy as jnp

from pcseg_tpu.ops import geom
from pcseg_tpu.protos import pcseg_pb2
from pcseg_tpu.utils import cloud as cloud_lib
from pcseg_tpu.utils import io


def make_cloud(h=6, w=8, seed=0):
    rng = np.random.default_rng(seed)
    pose = geom.Pose(
        geom.quat_normalize(jnp.asarray(rng.normal(size=4),
                                        dtype=jnp.float32)),
        jnp.asarray(rng.normal(size=3), dtype=jnp.float32))
    return cloud_lib.PointCloud(
        points=jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32)),
        normals=jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32)),
        intensities=jnp.asarray(rng.random((h, w)).astype(np.float32)),
        colors=jnp.asarray(rng.random((h, w, 3)).astype(np.float32)),
        pose=pose)


class TestProtoRoundTrip:
    def test_wire_round_trip(self):
        c = make_cloud()
        proto = io.cloud_to_proto(c)
        data = proto.SerializeToString()
        back_proto = pcseg_pb2.MultichannelCloudProto()
        back_proto.ParseFromString(data)
        back = io.proto_to_cloud(back_proto)
        np.testing.assert_allclose(np.asarray(back.points),
                                   np.asarray(c.points), atol=1e-6)
        np.testing.assert_allclose(np.asarray(back.intensities),
                                   np.asarray(c.intensities), atol=1e-6)
        np.testing.assert_allclose(np.asarray(back.pose.quat),
                                   np.asarray(c.pose.quat), atol=1e-6)
        assert back.sensor_origins is None

    def test_colmajor_linearization(self):
        """The proto's repeated floats follow the reference's col-major
        CloudView mapping: value[(col*rows + row)*3 + k]."""
        c = make_cloud(3, 4)
        proto = io.cloud_to_proto(c)
        pts = np.asarray(c.points)
        rows = 3
        for col in range(4):
            for row in range(3):
                lin = col * rows + row
                np.testing.assert_allclose(
                    proto.points_xyz[lin * 3:lin * 3 + 3], pts[row, col],
                    atol=1e-6)

    def test_nan_invalid_points_survive(self):
        c = make_cloud()
        pts = np.asarray(c.points).copy()
        pts[2, 3] = np.nan
        c = cloud_lib.PointCloud(points=jnp.asarray(pts), pose=c.pose)
        back = io.proto_to_cloud(io.cloud_to_proto(c))
        assert np.all(np.isnan(np.asarray(back.points)[2, 3]))

    def test_transform_matches_reference_semantics(self):
        """TransformInPlace rotates points and normals only
        (multichannel_cloud.cc:53-68)."""
        c = make_cloud()
        pose = geom.Pose(
            geom.quat_normalize(jnp.asarray([0.9, 0.1, -0.2, 0.3])),
            jnp.asarray([1.0, 2.0, 3.0]))
        t = c.transform(pose)
        np.testing.assert_allclose(
            np.asarray(t.points),
            np.asarray(pose.apply(c.points)), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(t.normals),
            np.asarray(pose.rotate(c.normals)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t.intensities),
                                   np.asarray(c.intensities))

    def test_resize_preserves_overlap(self):
        c = make_cloud(6, 8)
        r = c.resize(4, 10)
        np.testing.assert_allclose(np.asarray(r.points)[:4, :8],
                                   np.asarray(c.points)[:4, :8])
        assert r.points.shape == (4, 10, 3)
        np.testing.assert_allclose(np.asarray(r.points)[:, 8:], 0.0)
