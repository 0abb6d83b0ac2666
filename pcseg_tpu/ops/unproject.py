"""Depth-image ingestion: u16 depth/range frames -> organized point clouds.

The reference consumes clouds that some upstream robot pipeline already
unprojected into `MultichannelCloudProto` repeated-float fields
(/root/reference/pointcloud_segmentation/multichannel_cloud.proto:33-38) —
12 bytes/pixel on the wire. A TPU-native serving deployment should ship the
sensor's native payload instead (u16 depth, 2 bytes/pixel, 6x less
host->device traffic) and unproject on device against a precomputed ray
table: one multiply per pixel, fused by XLA into whatever consumes the
points. This module provides that ingestion path; it is also the benchmark's
transport format (see bench.py).

Conventions: 0 = invalid (NaN point), ``scale`` converts integer units to
meters (default 1/4000 m: 0.25 mm resolution, 16.4 m max range — covers the
reference's 4 m discontinuity gate with margin).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

DEFAULT_DEPTH_SCALE = 1.0 / 4000.0  # meters per integer unit


def camera_ray_table(rows: int, cols: int, f: float,
                     cy: float | None = None, cz: float | None = None,
                     dtype=np.float32) -> np.ndarray:
    """Unit ray directions [H, W, 3] for the robot camera convention used
    throughout the fixtures (utils/synthetic.py): +x forward, y along
    columns, z up along decreasing rows, focal length ``f`` pixels."""
    cy = rows / 2.0 if cy is None else cy
    cz = cols / 2.0 if cz is None else cz
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    d = np.stack([np.ones_like(rr, np.float64),
                  (cc - cz) / f,
                  (cy - rr) / f], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d.astype(dtype)


def unproject_range(range_u16: jnp.ndarray, rays: jnp.ndarray,
                    scale: float = DEFAULT_DEPTH_SCALE) -> jnp.ndarray:
    """[..., H, W] u16 range-along-ray -> [..., H, W, 3] float32 points.

    0 is the invalid sentinel -> NaN point (the reference's NaN-invalid
    convention, multichannel_cloud.proto:30-31)."""
    r = range_u16.astype(jnp.float32) * jnp.float32(scale)
    valid = range_u16 > 0
    r = jnp.where(valid, r, jnp.nan)
    return r[..., None] * rays


def encode_range(points: np.ndarray,
                 scale: float = DEFAULT_DEPTH_SCALE) -> np.ndarray:
    """Host-side inverse of :func:`unproject_range`: [H, W, 3] points ->
    [H, W] u16 range image (NaN/out-of-range -> 0)."""
    r = np.linalg.norm(points.astype(np.float64), axis=-1) / scale
    r = np.where(np.isfinite(r) & (r >= 1.0) & (r <= 65535.0), r, 0.0)
    return np.round(r).astype(np.uint16)


def unproject_range_np(range_u16: np.ndarray, rays: np.ndarray,
                       scale: float = DEFAULT_DEPTH_SCALE) -> np.ndarray:
    """NumPy twin of :func:`unproject_range` — bit-identical f32 results.

    Lets the full host pipeline (segment_frame_stream) reconstruct the
    device's point grid from the SAME u16 payload instead of shipping
    [H, W, 3] float32 across the host<->device link: both sides do the
    identical IEEE f32 multiply chain."""
    r = range_u16.astype(np.float32) * np.float32(scale)
    r = np.where(range_u16 > 0, r, np.float32(np.nan))
    return (r[..., None] * rays).astype(np.float32)
