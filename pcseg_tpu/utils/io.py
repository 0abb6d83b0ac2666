"""MultichannelCloudProto <-> PointCloud conversion.

The reference memory-maps typed CloudViews directly onto the proto's
repeated-float fields (multichannel_cloud.cc:70-107, cloud_proto_utils.h);
its storage order is therefore the cloud's col-major linearization
(``value[(col*rows + row)*C + c]``). This module serializes/deserializes the
TPU PointCloud to that layout so payloads interoperate with the reference's
channel fields (field numbers match, see protos/pcseg.proto).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pcseg_tpu.ops import geom
from pcseg_tpu.protos import pcseg_pb2
from pcseg_tpu.utils import cloud as cloud_lib


def _flatten_cm(arr: np.ndarray) -> np.ndarray:
    """[H, W(, C)] -> flat col-major channel data."""
    if arr.ndim == 2:
        arr = arr[..., None]
    return np.swapaxes(np.asarray(arr), 0, 1).reshape(-1)


def _unflatten_cm(data, rows, cols, comps):
    arr = np.asarray(data, np.float32).reshape(cols, rows, comps)
    arr = np.swapaxes(arr, 0, 1)
    return arr[..., 0] if comps == 1 else arr


def cloud_to_proto(cloud: cloud_lib.PointCloud,
                   proto=None) -> pcseg_pb2.MultichannelCloudProto:
    if proto is None:
        proto = pcseg_pb2.MultichannelCloudProto()
    proto.height = cloud.rows
    proto.width = cloud.cols
    for name, field, _ in cloud_lib.CHANNELS:
        value = getattr(cloud, name)
        getattr(proto, field)[:] = []
        if value is not None:
            getattr(proto, field).extend(
                _flatten_cm(np.asarray(value)).tolist())
    pose = cloud.pose
    q = np.asarray(pose.quat, np.float64)
    t = np.asarray(pose.trans, np.float64)
    proto.point_cloud_pose_sensor.translation.x = t[0]
    proto.point_cloud_pose_sensor.translation.y = t[1]
    proto.point_cloud_pose_sensor.translation.z = t[2]
    proto.point_cloud_pose_sensor.qw = q[0]
    proto.point_cloud_pose_sensor.qx = q[1]
    proto.point_cloud_pose_sensor.qy = q[2]
    proto.point_cloud_pose_sensor.qz = q[3]
    return proto


def plane_estimator_to_proto(m, proto=None) -> pcseg_pb2.PlaneEstimatorProto:
    """PlaneMoments -> PlaneEstimatorProto (plane_estimator.cc:231-245);
    the serializable accumulator is the reference's checkpoint/resume
    mechanism (SURVEY.md §5)."""
    if proto is None:
        proto = pcseg_pb2.PlaneEstimatorProto()
    proto.covariance_accumulator[:] = np.asarray(m.s2, np.float32).tolist()
    proto.cumulative_centroid[:] = np.asarray(m.s1, np.float32).tolist()
    proto.cumulative_weights = float(m.w)
    proto.normal[:] = np.asarray(m.normal_hint, np.float32).tolist()
    return proto


def plane_estimator_from_proto(proto):
    """PlaneEstimatorProto -> PlaneMoments (plane_estimator.cc:28-44)."""
    from pcseg_tpu.ops import plane_fit
    return plane_fit.PlaneMoments(
        s2=jnp.asarray(list(proto.covariance_accumulator), jnp.float32),
        s1=jnp.asarray(list(proto.cumulative_centroid), jnp.float32),
        w=jnp.asarray(proto.cumulative_weights, jnp.float32),
        normal_hint=jnp.asarray(list(proto.normal), jnp.float32))


def proto_to_cloud(proto: pcseg_pb2.MultichannelCloudProto
                   ) -> cloud_lib.PointCloud:
    rows, cols = proto.height, proto.width
    kwargs = {}
    for name, field, comps in cloud_lib.CHANNELS:
        data = getattr(proto, field)
        if len(data):
            expected = rows * cols * comps
            assert len(data) == expected, \
                f"channel {field}: {len(data)} != {expected}"
            kwargs[name] = jnp.asarray(
                _unflatten_cm(data, rows, cols, comps))
    p = proto.point_cloud_pose_sensor
    pose = geom.Pose(
        jnp.asarray([p.qw or 1.0, p.qx, p.qy, p.qz], jnp.float32),
        jnp.asarray([p.translation.x, p.translation.y, p.translation.z],
                    jnp.float32))
    return cloud_lib.PointCloud(pose=pose, **kwargs)
