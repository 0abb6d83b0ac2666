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


class TestConfigProtos:
    """Wire round trip of the reference's config schemas
    (region_segmentation_config.proto:22-72,
    plane_classification_config.proto:23-58)."""

    def test_planar_roundtrip_and_defaults(self):
        import dataclasses
        from pcseg_tpu.models.config import PlanarRegionConfig
        from pcseg_tpu.protos import pcseg_pb2

        cfg = dataclasses.replace(PlanarRegionConfig(),
                                  max_plane_distance=0.08,
                                  min_region_inliers=9)
        rt = io.planar_config_from_proto(io.planar_config_to_proto(cfg))
        for f in io._PLANAR_FIELDS:
            # proto float fields are f32 on the wire
            assert np.float32(getattr(rt, f)) == np.float32(
                getattr(cfg, f)), f

        # ApplyDefaultConfigValues: unset fields -> reference defaults
        empty = io.planar_config_from_proto(pcseg_pb2.PlanarRegionConfigProto())
        assert empty == PlanarRegionConfig()

        # partial: one set field, rest defaults (planar_region.h:93-121)
        p = pcseg_pb2.PlanarRegionConfigProto()
        p.max_plane_distance = 0.2
        got = io.planar_config_from_proto(p)
        assert got.max_plane_distance == np.float32(0.2)
        assert got.min_region_inliers == 5
        assert got.plane_model_reestimation_period == 30

    def test_cluster_roundtrip_and_method(self):
        from pcseg_tpu.models.config import (ClusterMethod,
                                             ClusterRegionConfig)
        from pcseg_tpu.protos import pcseg_pb2
        import dataclasses
        cfg = dataclasses.replace(ClusterRegionConfig(),
                                  cluster_method=ClusterMethod.MEAN_SHIFT,
                                  half_search_window=2)
        rt = io.cluster_config_from_proto(io.cluster_config_to_proto(cfg))
        assert rt.cluster_method is ClusterMethod.MEAN_SHIFT
        assert rt.half_search_window == 2
        empty = io.cluster_config_from_proto(
            pcseg_pb2.ClusterRegionConfigProto())
        assert empty == ClusterRegionConfig()
        assert empty.min_region_inliers == 7
        assert empty.squared_distance_threshold == 1.0

    def test_classification_roundtrip(self):
        from pcseg_tpu.models.config import (
            ClassifyHorizontalPlaneParams, ClassifyWallParams,
            PlaneClassificationConfig)
        cfg = PlaneClassificationConfig(
            floor_params=ClassifyHorizontalPlaneParams(
                max_up_direction_delta_angle_degrees=10.0,
                floor_offset=-1.0, max_floor_offset_deviation=0.1,
                min_area=0.3, max_area=100.0),
            wall_params=ClassifyWallParams(
                max_horizontal_delta_angle_degrees=10.0, min_height=0.5))
        rt = io.classification_config_from_proto(
            io.classification_config_to_proto(cfg))
        # proto float fields are f32 on the wire
        rt2 = io.classification_config_from_proto(
            io.classification_config_to_proto(rt))
        assert rt2 == rt
        assert np.float32(rt.floor_params.min_area) == np.float32(0.3)
        assert rt.wall_params.min_height == 0.5
