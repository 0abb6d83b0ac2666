"""Region boundary extraction and the host finalize pass for planar regions.

The reference finalizes each planar region with a Moore boundary trace,
convex hull, Stokes area, and geometric discontinuity detection
(/root/reference/pointcloud_segmentation/planar_region.h:189-425 + .cc).
These are ordering-dependent walks over *small* per-region sets — the
natural host seam. The dense growth already happened on device
(models/planar.py); this pass:

  1. traces each candidate region's outer boundary (Moore walk, exact port
     of the direction tables and revisit handling),
  2. applies the extent (CheckMinRowsAndCols, strict >3 spreads,
     planar_region.cc:91-106), hull-size, and min-area gates
     (planar_region.h:205-223) — implementing the *intended* hull-size gate
     (the reference's unsized hull buffer rejects everything; see
     pcseg_tpu/oracle.py docstring),
  3. rejects failing regions (their pixels revert to kUnlabeled — identical
     final state to the reference's quarantine-then-reset) and compacts
     surviving ids,
  4. computes discontinuous boundary points (planar_region.h:356-417).

Start-point note: the reference starts tracing from the last BFS inlier
that lies on a boundary (planar_region.h:198-203); BFS order is not
materialized on device, so we start from a member adjacent to the *outside*
component — always on the outer boundary. If a region has interior holes
the reference may (depending on inlier order) trace a hole ring instead and
reject the region by area; we always trace the outer ring. Divergence is
confined to hole-y regions and documented here.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import numpy as np

from pcseg_tpu.models.config import (
    UNLABELED, PlanarRegionConfig, PlaneClass)
from pcseg_tpu.utils import hostgeom
from pcseg_tpu import native as _native


def neighborhood(use8: bool, rows: int):
    """Direction table (delta_x=col, delta_y=row, delta_index) —
    planar_region.cc:26-45."""
    if use8:
        return [(-1, 0, -rows), (-1, -1, -rows - 1), (0, -1, -1),
                (1, -1, rows - 1), (1, 0, rows), (1, 1, rows + 1),
                (0, 1, 1), (-1, 1, -rows + 1)]
    return [(-1, 0, -rows), (0, -1, -1), (1, 0, rows), (0, 1, 1)]


def moore_trace(mask: np.ndarray, start_idx: int, use8: bool = True):
    """Boundary walk of planar_region.h:295-353 on a bool member mask.

    ``start_idx`` is a col-major linear index of a member with at least one
    in-bounds non-member neighbor. Returns the ordered boundary index list
    (with the reference's one-pixel-branch revisits) or None if start is
    not on a boundary. Uses the native C++ walk when available
    (pcseg_tpu/native/hostops.cc), falling back to the pure-Python port.
    """
    rows, cols = mask.shape
    if use8:
        lib = _native.load_hostops()
        if lib is not None:
            import ctypes
            mask_cm = np.ascontiguousarray(mask.T).astype(np.uint8)
            cap = 8 * (rows * cols + 16)
            out = np.empty(cap, np.int64)
            n = lib.pcseg_moore_trace(
                mask_cm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                rows, cols, int(start_idx),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap)
            if n > 0:
                return [int(i) for i in out[:n]]
            if n == 0:
                return None
            # n < 0: capacity overflow — fall through to the Python walk
    dirs = neighborhood(use8, rows)

    def at(idx):
        return mask[idx % rows, idx // rows]

    curr_idx = start_idx
    curr_x, curr_y = start_idx // rows, start_idx % rows

    direction_idx = -1
    for i, d in enumerate(dirs):
        x, y = curr_x + d[0], curr_y + d[1]
        if 0 <= x < cols and 0 <= y < rows and not at(curr_idx + d[2]):
            direction_idx = i
            break
    if direction_idx < 0:
        return None

    boundary = []
    found_start = False
    while True:
        new_dir = -1
        for delta in range(1, len(dirs) + 1):
            ndi = (direction_idx + delta) % len(dirs)
            d = dirs[ndi]
            x, y = curr_x + d[0], curr_y + d[1]
            if 0 <= x < cols and 0 <= y < rows and at(curr_idx + d[2]):
                new_dir = ndi
                break
        assert new_dir >= 0, "isolated pixel cannot be traced"
        direction_idx = (new_dir + len(dirs) // 2) % len(dirs)
        curr_idx += dirs[new_dir][2]
        curr_x += dirs[new_dir][0]
        curr_y += dirs[new_dir][1]

        if found_start:
            if curr_idx == boundary[0]:
                break
            found_start = False
        boundary.append(curr_idx)
        if curr_idx == start_idx:
            found_start = True
    return boundary


def find_outer_start(mask: np.ndarray) -> Optional[int]:
    """A member pixel on the outer boundary: adjacent (8-nbhd) to the
    non-member component connected to the grid border. None if the region
    has no in-bounds non-member neighbor at all (e.g. covers the grid —
    the reference then fails every FindInitialPredecessorDirection and
    rejects the region, planar_region.h:316-318)."""
    rows, cols = mask.shape
    lib = _native.load_hostops()
    if lib is not None:
        import ctypes
        mask_cm = np.ascontiguousarray(mask.T).astype(np.uint8)
        out_cm = np.zeros_like(mask_cm)
        lib.pcseg_flood_outside(
            mask_cm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            rows, cols,
            out_cm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        outside = out_cm.T.astype(bool)
        nonmember = ~mask
    else:
        outside = np.zeros_like(mask)
        # flood fill non-member cells from the border (iterative dilation)
        nonmember = ~mask
        frontier = np.zeros_like(mask)
        frontier[0, :] = nonmember[0, :]
        frontier[-1, :] = nonmember[-1, :]
        frontier[:, 0] = nonmember[:, 0]
        frontier[:, -1] = nonmember[:, -1]
        outside |= frontier
        while frontier.any():
            grown = np.zeros_like(mask)
            grown[1:, :] |= outside[:-1, :]
            grown[:-1, :] |= outside[1:, :]
            grown[:, 1:] |= outside[:, :-1]
            grown[:, :-1] |= outside[:, 1:]
            grown &= nonmember
            frontier = grown & ~outside
            outside |= frontier

    # members 8-adjacent to outside
    adj = np.zeros_like(mask)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            src = outside[max(0, -dr):outside.shape[0] - max(0, dr),
                          max(0, -dc):outside.shape[1] - max(0, dc)]
            adj[max(0, dr):adj.shape[0] - max(0, -dr),
                max(0, dc):adj.shape[1] - max(0, -dc)] |= src
    cand = mask & adj
    if not cand.any():
        # fall back: any member with an in-bounds non-member 8-neighbor
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                src = nonmember[max(0, -dr):mask.shape[0] - max(0, dr),
                                max(0, -dc):mask.shape[1] - max(0, dc)]
                cand[max(0, dr):cand.shape[0] - max(0, -dr),
                     max(0, dc):cand.shape[1] - max(0, -dc)] |= src
        cand &= mask
        if not cand.any():
            return None
    rs, cs = np.nonzero(cand)
    return int(cs[0] * mask.shape[0] + rs[0])


def check_min_rows_and_cols(indices, rows, min_cols=3, min_rows=3) -> bool:
    """planar_region.cc:91-106 (strict > comparisons)."""
    if not indices:
        return False
    idx = np.asarray(indices)
    x = idx // rows
    y = idx % rows
    return (x.max() - x.min()) > min_cols and (y.max() - y.min()) > min_rows


def discontinuous_boundary(boundary, points, normals, labels, region_label,
                           rot_robot, config: PlanarRegionConfig):
    """planar_region.h:356-417: per-boundary-point geometric discontinuity
    checks against same-label 4-neighbors (the code compares same-label
    neighbors despite its comment; replicated)."""
    rows, cols = labels.shape
    dirs4 = neighborhood(False, rows)
    min_sq = np.float32(config.discontinuity_min_range ** 2)
    max_sq = np.float32(config.discontinuity_max_range ** 2)
    out = set()

    def at_lin(arr, idx):
        return arr[idx % rows, idx // rows]

    for idx in boundary:
        p = at_lin(points, idx).astype(np.float32)
        sq = np.float32(np.sum(p * p))
        if not (min_sq < sq < max_sq):
            continue
        n_inb = 0
        for d in dirs4:
            x = idx // rows + d[0]
            y = idx % rows + d[1]
            if 0 <= x < cols and 0 <= y < rows:
                n_inb += 1
        if n_inb != 4:  # kNSkipCycles (planar_region.h:368-371)
            continue
        for d in dirs4:
            nb = idx + d[2]
            pn = at_lin(points, nb)
            if math.isnan(float(p[2])) or math.isnan(float(pn[2])):
                continue
            if at_lin(labels, nb) != region_label:
                continue
            delta = (p - pn).astype(np.float32)
            delta_r = rot_robot @ delta
            cosang = float(at_lin(normals, idx) @ at_lin(normals, nb))
            ang = (abs(math.degrees(np.arccos(np.float32(cosang))))
                   if -1.0 <= cosang <= 1.0 else float("nan"))
            dz = abs(float(delta_r[2]))
            if (not math.isnan(ang)
                    and ang < config.discontinuity_normal_angle_diff
                    and dz < config.discontinuity_z_diff):
                continue
            norm = float(np.linalg.norm(delta_r))
            if norm > 0 and dz / norm < config.discontinuity_z_ratio:
                continue
            out.add(int(idx))
    return out


@dataclasses.dataclass
class PlanarRegionRecord:
    """Host-side finalized region (the reference's PlanarRegion fields,
    planar_region.h:452-464)."""
    label_id: int
    plane: np.ndarray
    centroid: np.ndarray
    curvature: float
    area: float
    count: int
    seed_point_index: int
    boundary_indices: List[int]
    discontinuous_boundary_indices: set
    projected_boundary_points: np.ndarray  # convex hull, in-plane
    plane_class: PlaneClass = PlaneClass.UNKNOWN


def finalize_planar_regions(points, normals, device_regions,
                            config: PlanarRegionConfig,
                            initial_id_offset: int = 0,
                            rot_robot: Optional[np.ndarray] = None):
    """Apply the deferred finalize gates and build host region records.

    Args:
      points/normals: [H, W, 3] numpy.
      device_regions: models.planar.PlanarRegions (device output).
      config: planar config.
      initial_id_offset: same offset passed to the device pass.
      rot_robot: 3x3 rotation of robot_pose_point_cloud (for the
        discontinuity z checks); identity if None.

    Returns (labels [H, W] int32 with compacted ids, [PlanarRegionRecord]).
    """
    labels = np.asarray(device_regions.labels).copy()
    rows = labels.shape[0]
    n = int(device_regions.num_regions)
    planes = np.asarray(device_regions.planes)
    centroids = np.asarray(device_regions.centroids)
    curvatures = np.asarray(device_regions.curvatures)
    counts = np.asarray(device_regions.counts)
    seeds = np.asarray(device_regions.seed_indices)
    rot = np.eye(3, dtype=np.float32) if rot_robot is None else rot_robot

    records: List[PlanarRegionRecord] = []
    relabel = {}
    for rid in range(n):
        old_id = rid + initial_id_offset
        mask = labels == old_id
        ok = False
        boundary = None
        hull = np.zeros((0, 3), np.float32)
        area = 0.0
        start = find_outer_start(mask)
        if start is not None:
            boundary = moore_trace(mask, start, use8=True)
        if boundary:
            if check_min_rows_and_cols(boundary, rows):
                bpts = np.array([points[i % rows, i // rows]
                                 for i in boundary], np.float32)
                hull = hostgeom.planar_convex_hull(bpts, planes[rid])
                if len(hull) >= 3:
                    area = hostgeom.polygon_area(bpts)
                    ok = area >= config.min_region_area
        if not ok:
            labels[mask] = UNLABELED
            continue
        new_id = len(records) + initial_id_offset
        relabel[old_id] = new_id
        disc = discontinuous_boundary(
            boundary, points, normals, labels, old_id, rot, config)
        records.append(PlanarRegionRecord(
            label_id=new_id,
            plane=planes[rid].copy(),
            centroid=centroids[rid].copy(),
            curvature=float(curvatures[rid]),
            area=float(area),
            count=int(counts[rid]),
            seed_point_index=int(seeds[rid]),
            boundary_indices=list(boundary),
            discontinuous_boundary_indices=disc,
            projected_boundary_points=hull,
        ))

    # compact ids in one pass
    if relabel:
        out = labels.copy()
        for old_id, new_id in relabel.items():
            if old_id != new_id:
                out[labels == old_id] = new_id
        labels = out
    return labels, records
