"""Organized-cloud normal estimation — dense TPU reformulation.

The reference computes a normal per pixel by walking outward along the four
grid axes until a neighbor lands in a [min, max] euclidean distance band,
optionally adding 4 diagonal neighbors, then fitting a plane through the
supports with the incremental-PCA estimator and orienting it toward the
sensor (/root/reference/pointcloud_segmentation/algorithms.h:106-257,330-375).

TPU design: the data-dependent walk becomes a **bounded directional scan** —
for each of the 4 directions we examine offsets k = 1..K (static K =
``params.max_scan_steps``) and select the first offset whose point is finite
and whose distance from the center is inside the band. This is exact parity
with the reference whenever the walk terminates within K steps (on real depth
data with max_neighbor_distance 1 m it terminates within a few pixels; K=16
is generous). The per-pixel 9-point plane fit is a batched closed-form
eigensolve over all H*W pixels at once.

Performance notes (measured on TPU v5e, 480x640):
  * moments accumulate INTO ten scalar [H, W] grids as each support is
    found — no [H, W, S, 3] support stack is ever materialized;
  * shifts are pad+slice (the cheapest shift HLOs);
  * the 4 diagonal supports (data-dependent 2-D indices, a genuine gather)
    are fetched with ONE combined gather;
  * the per-pixel eigensolve runs in component-grid form
    (ops/geom.eigh3x3_smallest_c) — no [H, W, 3, 3] layouts, no gathers.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pcseg_tpu.models.config import ComputeNormalsParams
from pcseg_tpu.ops import geom, nansafe, plane_fit

_BIG = jnp.inf


def _shift(arr, dr, dc, fill):
    """Shift [H, W, ...] by (dr, dc), filling vacated cells with ``fill``.

    shifted[r, c] = arr[r - dr, c - dc] where in bounds. One pad + one
    slice per axis — the cheapest shift HLOs on TPU (no scatter).
    """
    h, w = arr.shape[0], arr.shape[1]
    if abs(dr) >= h or abs(dc) >= w:
        return jnp.full_like(arr, fill)
    pad = [(0, 0)] * arr.ndim
    idx = [slice(None)] * arr.ndim
    if dr > 0:
        pad[0] = (dr, 0)
        idx[0] = slice(0, h)
    elif dr < 0:
        pad[0] = (0, -dr)
        idx[0] = slice(-dr, h - dr)
    if dc > 0:
        pad[1] = (dc, 0)
        idx[1] = slice(0, w)
    elif dc < 0:
        pad[1] = (0, -dc)
        idx[1] = slice(-dc, w - dc)
    fill_v = jnp.asarray(fill, arr.dtype)
    padded = jnp.pad(arr, pad, constant_values=fill_v)
    return padded[tuple(idx)]


class _Moments10(NamedTuple):
    """Ten scalar moment accumulator grids (xx, xy, xz, yy, yz, zz, x, y,
    z, w) — the estimator state in TPU-native layout."""
    xx: jnp.ndarray
    xy: jnp.ndarray
    xz: jnp.ndarray
    yy: jnp.ndarray
    yz: jnp.ndarray
    zz: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    w: jnp.ndarray

    def add(self, p, ok):
        """Accumulate support point p [H, W, 3] where ok [H, W] (masked)."""
        okf = ok.astype(p.dtype)
        px = jnp.where(ok, p[..., 0], 0.0)
        py = jnp.where(ok, p[..., 1], 0.0)
        pz = jnp.where(ok, p[..., 2], 0.0)
        return _Moments10(
            xx=self.xx + px * px, xy=self.xy + px * py,
            xz=self.xz + px * pz, yy=self.yy + py * py,
            yz=self.yz + py * pz, zz=self.zz + pz * pz,
            x=self.x + px, y=self.y + py, z=self.z + pz,
            w=self.w + okf)

    @staticmethod
    def zeros(shape, dtype):
        z = jnp.zeros(shape, dtype)
        return _Moments10(z, z, z, z, z, z, z, z, z, z)

    def to_plane_moments(self, hint):
        return plane_fit.PlaneMoments(
            s2=jnp.stack([self.xx, self.xy, self.xz, self.yy, self.yz,
                          self.zz], axis=-1),
            s1=jnp.stack([self.x, self.y, self.z], axis=-1),
            w=self.w,
            normal_hint=hint)


class _DirectionalScan(NamedTuple):
    found: jnp.ndarray   # [H, W] bool — a neighbor was accepted
    point: jnp.ndarray   # [H, W, 3] accepted neighbor coordinates (or 0)
    coord: jnp.ndarray   # [H, W] int32 accepted row (vertical) / col (horiz.)


def _scan_direction(padded, padded_ok, center, dr, dc, k_max, min_d2,
                    max_d2, rows_idx, cols_idx):
    """First in-band neighbor along direction (dr, dc), offsets 1..k_max.

    Mirrors the row/col walks of FindNormalSupportNeighbors
    (algorithms.h:136-199): skip non-finite, accept the first neighbor with
    min_d2 <= ||p - center||^2 <= max_d2.

    ``padded`` is the NaN-padded cloud. The k loop is a ``fori_loop`` over
    one dynamic_slice per step — on-device loop iterations are nearly free
    on TPU and keep the XLA:CPU compile linear in 1, not k_max (a
    statically unrolled K=16 chain was tried and sent CPU compiles of the
    composed pipeline programs to ~10 minutes — the known XLA:CPU
    pad/slice-chain pathology, CLAUDE.md).
    """
    h, w = center.shape[0], center.shape[1]
    pk = (padded.shape[0] - h) // 2

    def body(k, state):
        found, acc_point, acc_coord = state
        p = jax.lax.dynamic_slice(
            padded, (pk + dr * k, pk + dc * k, 0), (h, w, 3))
        p_ok = jax.lax.dynamic_slice(
            padded_ok, (pk + dr * k, pk + dc * k), (h, w))
        d2 = jnp.sum(jnp.square(p - center), axis=-1)
        # validity is an explicit boolean AND — `NaN compare false` is not
        # reliable inside large fused TPU programs (ops/nansafe.py)
        ok = p_ok & (d2 >= min_d2) & (d2 <= max_d2)
        take = ok & ~found
        found = found | take
        acc_point = jnp.where(take[..., None], p, acc_point)
        coord = (rows_idx + dr * k) if dr != 0 else (cols_idx + dc * k)
        acc_coord = jnp.where(take, coord, acc_coord)
        return found, acc_point, acc_coord

    found, acc_point, acc_coord = jax.lax.fori_loop(
        1, k_max + 1,
        body,
        (jnp.zeros((h, w), bool), jnp.zeros_like(center),
         jnp.zeros((h, w), jnp.int32)))
    return _DirectionalScan(found, acc_point, acc_coord)


class NormalSupport(NamedTuple):
    """Support neighborhood for every pixel."""
    count: jnp.ndarray           # [H, W] int32 — support size incl. center
    moments: plane_fit.PlaneMoments  # batched [H, W]
    center_valid: jnp.ndarray    # [H, W] bool


def find_normal_support(points: jnp.ndarray,
                        params: ComputeNormalsParams) -> NormalSupport:
    """Vectorized FindNormalSupportNeighbors (algorithms.h:106-257).

    points: [H, W, 3]. Returns per-pixel support counts and plane-fit moment
    accumulators over the supports (center + up to 4 axis + 4 diagonal
    neighbors).
    """
    h, w = points.shape[0], points.shape[1]
    dtype = points.dtype
    min_d2 = params.min_neighbor_distance ** 2
    max_d2 = params.max_neighbor_distance ** 2
    k_max = params.max_scan_steps

    center = points
    center_valid = nansafe.all_finite(points)

    rows_idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols_idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    padded = jnp.pad(points, ((k_max, k_max), (k_max, k_max), (0, 0)),
                     constant_values=jnp.nan)
    padded_ok = jnp.pad(center_valid, ((k_max, k_max), (k_max, k_max)),
                        constant_values=False)
    up = _scan_direction(padded, padded_ok, center, -1, 0, k_max, min_d2,
                         max_d2, rows_idx, cols_idx)
    down = _scan_direction(padded, padded_ok, center, 1, 0, k_max, min_d2,
                           max_d2, rows_idx, cols_idx)
    left = _scan_direction(padded, padded_ok, center, 0, -1, k_max, min_d2,
                           max_d2, rows_idx, cols_idx)
    right = _scan_direction(padded, padded_ok, center, 0, 1, k_max, min_d2,
                            max_d2, rows_idx, cols_idx)

    acc = _Moments10.zeros((h, w), dtype)
    acc = acc.add(center, center_valid)
    acc = acc.add(up.point, up.found)
    acc = acc.add(down.point, down.found)
    acc = acc.add(left.point, left.found)
    acc = acc.add(right.point, right.found)
    count = (center_valid.astype(jnp.int32) + up.found + down.found
             + left.found + right.found)

    if params.include_diagonal_neighbors:
        # min/max row/col defaults: clamped +-1 like the reference init
        # (algorithms.h:129-132); replaced by the accepted walk coordinate.
        min_row = jnp.where(up.found, up.coord, jnp.maximum(rows_idx - 1, 0))
        max_row = jnp.where(down.found, down.coord,
                            jnp.minimum(rows_idx + 1, h - 1))
        min_col = jnp.where(left.found, left.coord,
                            jnp.maximum(cols_idx - 1, 0))
        max_col = jnp.where(right.found, right.coord,
                            jnp.minimum(cols_idx + 1, w - 1))

        # Diagonal gates: only if the respective side actually differs from
        # the center coordinate (algorithms.h:207,209,220,232-245).
        has_up = min_row != rows_idx
        has_down = max_row != rows_idx
        has_left = min_col != cols_idx
        has_right = max_col != cols_idx
        diag_sel = [
            (has_left & has_up, min_row, min_col),      # upper-left
            (has_left & has_down, max_row, min_col),    # lower-left
            (has_right & has_up, min_row, max_col),     # upper-right
            (has_right & has_down, max_row, max_col),   # lower-right
        ]
        # One combined gather for all four diagonal supports.
        lin = jnp.stack([r * w + c for _, r, c in diag_sel])  # [4, H, W]
        # One combined [4*HW] gather. Alternative formulations were measured
        # slower IN CONTEXT on the chip (per-component jnp.take from [HW]
        # planes: 529 vs 381 ms/batch at VGA; optimization barriers around
        # the gather did not help) even though the per-component form is
        # 4.4x faster in isolation — the batched-gather lowering under vmap
        # dominates either way.
        flat = points.reshape(-1, 3)
        diag_pts = flat[lin.reshape(-1)].reshape(4, h, w, 3)
        diag_ok = center_valid.reshape(-1)[lin.reshape(-1)].reshape(4, h, w)
        for i, (gate, _, _) in enumerate(diag_sel):
            p = diag_pts[i]
            d2 = jnp.sum(jnp.square(p - center), axis=-1)
            # explicit validity AND (see _scan_direction)
            ok = gate & diag_ok[i] & (d2 >= min_d2) & (d2 <= max_d2)
            acc = acc.add(p, ok)
            count = count + ok

    # The reference returns 0 supports for a non-finite center
    # (algorithms.h:125-127).
    count = jnp.where(center_valid, count, 0)
    moments = acc.to_plane_moments(
        jnp.zeros((h, w, 3), dtype).at[..., 0].set(1.0))
    return NormalSupport(count=count, moments=moments,
                         center_valid=center_valid)


def normals_from_support(support: NormalSupport, points: jnp.ndarray,
                         sensor_origin: jnp.ndarray,
                         params: ComputeNormalsParams) -> jnp.ndarray:
    """Orient + solve the per-pixel plane fits of ``support``.

    Split out of :func:`compute_normals_organized` so a column shard can
    accumulate support over its halo'd block but run the (comparatively
    expensive) eigensolve on LOCAL columns only (parallel/sharded.py)."""
    # Orientation hint: sensor_origin - point (algorithms.h:354-355). The
    # estimator is freshly cleared per pixel, so the hint fully determines
    # the sign (plane_estimator.cc:121-125).
    hint = sensor_origin - points
    hint = jnp.where(nansafe.isfinite(hint), hint, 1.0)
    moments = plane_fit.set_normal_orientation(support.moments, hint)

    sol = plane_fit.solve(moments)

    ok = (support.center_valid
          & (support.count >= params.min_num_support_neighbors)
          & sol.valid)
    return jnp.where(ok[..., None], sol.normal, jnp.nan)


def compute_normals_organized(
        points: jnp.ndarray,
        sensor_origin: jnp.ndarray,
        params: ComputeNormalsParams = ComputeNormalsParams(),
        row_range: Optional[Tuple[int, int]] = None,
        col_range: Optional[Tuple[int, int]] = None,
        out_normals: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """ComputeNormalsOrganized (algorithms.h:330-375), dense over the grid.

    Args:
      points: [H, W, 3] organized cloud (NaN = invalid).
      sensor_origin: [3] sensor position in the cloud frame
        (``point_cloud_pose_sensor.translation()``, algorithms.h:354-355).
      params: neighbor-band parameters.
      row_range/col_range: optional half-open subrectangle to compute —
        the reference's tiling seam (algorithms.h:333). Pixels outside keep
        ``out_normals`` (or NaN).
      out_normals: optional [H, W, 3] buffer supplying out-of-range values.

    Returns [H, W, 3] unit normals oriented toward the sensor; NaN where the
    center is invalid, support < min_num_support_neighbors, or the plane fit
    is degenerate.
    """
    h, w = points.shape[0], points.shape[1]
    support = find_normal_support(points, params)
    normals = normals_from_support(support, points, sensor_origin, params)

    if row_range is not None or col_range is not None:
        r0, r1 = row_range if row_range is not None else (0, h)
        c0, c1 = col_range if col_range is not None else (0, w)
        rows_idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols_idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        in_range = ((rows_idx >= r0) & (rows_idx < r1)
                    & (cols_idx >= c0) & (cols_idx < c1))
        outside = (out_normals if out_normals is not None
                   else jnp.full_like(normals, jnp.nan))
        normals = jnp.where(in_range[..., None], normals, outside)
    return normals
