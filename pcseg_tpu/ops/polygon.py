"""Batched polygon utilities (device-side subset of algorithms.h).

Triangulation and convex hulls are host-side (utils/hostgeom.py — small
per-region sets); these dense/batched forms serve on-device area gating and
plane projection.
"""

from __future__ import annotations

import jax.numpy as jnp

from pcseg_tpu.ops import geom


def is_inside_triangle(u, v, w, p):
    """Barycentric point-in-triangle for both windings
    (algorithms.h:39-64), batched over leading axes."""
    v0 = w - u
    v1 = v - u
    v2 = p - u
    dot00 = jnp.sum(v0 * v0, axis=-1)
    dot01 = jnp.sum(v0 * v1, axis=-1)
    dot02 = jnp.sum(v0 * v2, axis=-1)
    dot11 = jnp.sum(v1 * v1, axis=-1)
    dot12 = jnp.sum(v1 * v2, axis=-1)
    denom = dot00 * dot11 - dot01 * dot01
    inv = 1.0 / jnp.where(denom != 0, denom, 1.0)
    a = (dot11 * dot02 - dot01 * dot12) * inv
    b = (dot00 * dot12 - dot01 * dot02) * inv
    return (denom != 0) & (a >= 0) & (b >= 0) & (a + b < 1)


def cumulative_polygon_normal(vertices, valid=None):
    """Stokes cumulative normal over ordered polygons [..., N, 3]
    (algorithms.h:265-275). ``valid`` masks trailing padding (the wrap edge
    closes at the last valid vertex)."""
    if valid is None:
        nxt = jnp.roll(vertices, -1, axis=-2)
        return jnp.sum(jnp.cross(vertices, nxt), axis=-2)
    # with padding: edges only between consecutive valid vertices plus the
    # closing edge from the last valid to the first
    n = vertices.shape[-2]
    idx = jnp.arange(n)
    count = jnp.sum(valid.astype(jnp.int32), axis=-1, keepdims=True)
    nxt_idx = jnp.where(idx[None, :] + 1 < count, idx[None, :] + 1, 0)
    nxt = jnp.take_along_axis(vertices, nxt_idx[..., None], axis=-2)
    cross = jnp.cross(vertices, nxt)
    return jnp.sum(jnp.where(valid[..., None], cross, 0.0), axis=-2)


def polygon_area(vertices, valid=None):
    """algorithms.h:289-292, batched."""
    n = cumulative_polygon_normal(vertices, valid)
    return 0.5 * jnp.linalg.norm(n, axis=-1)


def polygon_normal(vertices, valid=None):
    """algorithms.h:279-284, batched (unit normal)."""
    n = cumulative_polygon_normal(vertices, valid)
    return n * jnp.reciprocal(jnp.maximum(
        jnp.linalg.norm(n, axis=-1, keepdims=True), geom.FLT_MIN))


def project_points_to_plane(points, plane):
    """algorithms.h:301-311, batched."""
    return geom.plane_project(plane, points)
