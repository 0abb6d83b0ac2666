"""Spatially-sharded segmentation over a TPU device mesh.

The reference is single-threaded C++ with no distributed story (SURVEY.md
§5); this module is the pod-scale design: the organized grid [H, W] is
sharded over **columns** across a 1-D mesh axis ("space"), every windowed op
exchanges halo rings over ICI (``ppermute``), plane-fit moments merge with
``psum`` (exact — the estimator's merge algebra is addition,
plane_estimator.cc:128-133), and cluster label unification runs local
min-propagation plus global pointer jumping. An optional "data" mesh axis
shards a batch of frames on top (BASELINE configs 4-5).

Semantics: identical to the single-device path with one documented
difference — seed ranking uses the corrected (natural) grid orientation
rather than the reference's transposed-access quirk (ops/seeds.py
docstring), since the quirk is only well-defined on square grids.

All collective control flow is replicated: every shard computes identical
region tables / plane solves from psum'd quantities, so the nested
while_loops stay in lockstep without extra synchronization.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from pcseg_tpu.models.config import (
    UNLABELED, EXAMINED, ClusterRegionConfig, ComputeNormalsParams,
    PlanarRegionConfig, SeedsFromPlaneSupportParams)
from pcseg_tpu.models import planar as planar_model
from pcseg_tpu.ops import geom, plane_fit
from pcseg_tpu.ops import normals as normals_op
from pcseg_tpu.ops import seeds as seeds_op
from pcseg_tpu.ops.normals import _shift
from pcseg_tpu.parallel.halo import exchange_halo, crop_halo


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "space") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]).reshape(n), (axis_name,))


# ---------------------------------------------------------------------------
# building blocks (all called inside shard_map over ``axis``)
# ---------------------------------------------------------------------------

def _dilate4_halo(frontier, axis):
    """4-neighborhood dilation across shard boundaries (halo 1)."""
    pad = exchange_halo(frontier, 1, axis, fill=False)
    return crop_halo(planar_model._dilate4(pad), 1)


def _gather_seed_values(grid_local, seed_indices, h, w_local, axis):
    """Values of a local [H, W_local(, C)] grid at *global* col-major seed
    indices, combined across shards with psum (each in-range index is owned
    by exactly one shard; non-owners contribute zero)."""
    shard = lax.axis_index(axis)
    r = seed_indices % h
    c_glob = seed_indices // h
    c_local = c_glob - shard * w_local
    owned = (c_local >= 0) & (c_local < w_local)
    c_safe = jnp.clip(c_local, 0, w_local - 1)
    flat = grid_local.reshape((h * w_local,) + grid_local.shape[2:])
    vals = flat[(r * w_local + c_safe).reshape(-1)].reshape(
        seed_indices.shape + grid_local.shape[2:])
    mask = owned.reshape(owned.shape + (1,) * (vals.ndim - owned.ndim))
    return lax.psum(jnp.where(mask, vals, 0), axis)


def sharded_normals(points_local, sensor_origin,
                    params: ComputeNormalsParams, axis):
    """Organized normals on a column shard — exact vs single device.

    Needs halo = max_scan_steps columns; a NaN halo at the true grid edges
    reproduces the single-device edge semantics (the scan just never finds
    a neighbor there)."""
    k = params.max_scan_steps
    padded = exchange_halo(points_local, k, axis, fill=jnp.nan)
    nrm = normals_op.compute_normals_organized(padded, sensor_origin, params)
    return crop_halo(nrm, k)


def sharded_plane_support_seeds(points_local, normals_local,
                                params: SeedsFromPlaneSupportParams,
                                h, w, axis):
    """Globally-ranked plane-support seeds from column shards.

    Local windowed counts with halo = window//2, then the full count grid is
    all-gathered (int32, H*W — e.g. 1.2 MB for VGA) so every shard computes
    the identical replicated ranking."""
    half = params.neighborhood_size // 2
    pp = exchange_halo(points_local, half, axis, fill=jnp.nan)
    np_ = exchange_halo(normals_local, half, axis, fill=jnp.nan)
    count_pad, ok_pad = seeds_op.plane_support_counts(pp, np_, params)
    count = crop_halo(count_pad, half)
    ok = crop_halo(ok_pad, half)

    count_full = _ungather(lax.all_gather(count, axis), h, w)
    ok_full = _ungather(lax.all_gather(ok, axis), h, w)
    qualifies = ok_full & (count_full >= params.min_num_support_points)
    return seeds_op.rank_plane_support_seeds(
        count_full, qualifies, h, w, params.max_seeds)


def _ungather(gathered, h, w):
    """[n_shards, H, W_local, ...] -> [H, W, ...] (columns concatenated)."""
    moved = jnp.moveaxis(gathered, 0, 1)         # [H, n, W_local, ...]
    return moved.reshape((h, w) + gathered.shape[3:])


def sharded_grow_planar_regions(points_local, normals_local, labels_local,
                                seed_indices, seed_valid,
                                config: PlanarRegionConfig,
                                h, w, axis,
                                initial_id_offset: int = 0,
                                max_attempts: int = 256):
    """Column-sharded SegmentRegions<PlanarRegion> (models/planar.py).

    Wavefronts dilate across shard boundaries via halo exchange; moment
    accumulators and counts merge with psum (exact); all scalar control
    state is replicated so every shard runs the identical attempt loop.
    """
    w_local = points_local.shape[1]
    dtype = points_local.dtype
    r_cap = config.max_regions
    tau = jnp.asarray(config.max_plane_distance, dtype)
    period = config.plane_model_reestimation_period
    min_inliers = config.min_region_inliers

    s = seed_indices.shape[0]
    seed_order = jnp.arange(s, dtype=jnp.int32)

    regions0 = planar_model.PlanarRegions(
        labels=labels_local,
        num_regions=jnp.int32(0),
        planes=jnp.zeros((r_cap, 4), dtype),
        centroids=jnp.zeros((r_cap, 3), dtype),
        curvatures=jnp.zeros((r_cap,), dtype),
        counts=jnp.zeros((r_cap,), jnp.int32),
        seed_indices=jnp.zeros((r_cap,), jnp.int32),
        moments=plane_fit.empty((r_cap,), dtype),
        overflow=jnp.bool_(False),
    )

    shard = lax.axis_index(axis)

    def local_onehot(seed_idx):
        r = seed_idx % h
        c_glob = seed_idx // h
        c_local = c_glob - shard * w_local
        owned = (c_local >= 0) & (c_local < w_local)
        c_safe = jnp.clip(c_local, 0, w_local - 1)
        grid = jnp.zeros((h, w_local), bool).at[r, c_safe].set(True)
        return grid & owned

    def grow_one(labels_in, seed_idx):
        seed_point = _gather_seed_values(
            points_local, seed_idx[None], h, w_local, axis)[0]
        seed_normal = _gather_seed_values(
            normals_local, seed_idx[None], h, w_local, axis)[0]
        plane0 = geom.plane_from_normal_point(seed_normal, seed_point)
        m0 = plane_fit.set_normal_orientation(
            plane_fit.empty((), dtype), seed_normal)
        frontier0 = local_onehot(seed_idx)
        member0 = jnp.zeros((h, w_local), bool)
        eligible = labels_in == UNLABELED

        def cond(state):
            _, _, _, _, _, it, active = state
            return active & (it < config.max_growth_iters)

        def body(state):
            member, frontier, plane, m, count, it, _ = state
            first = it == 0
            cand = jnp.where(first, frontier,
                             _dilate4_halo(frontier, axis)
                             & eligible & ~member)
            dist = jnp.abs(
                jnp.sum(plane[:3] * points_local, axis=-1) + plane[3])
            accepted = cand & (dist < tau)
            new_member = member | accepted
            dm_s2, dm_s1, dm_w = plane_fit.moments_of_points(
                jnp.where(accepted[..., None], points_local,
                          0.0).reshape(-1, 3),
                accepted.astype(dtype).reshape(-1))
            # exact cross-shard merge: accumulator addition == psum
            dm_s2 = lax.psum(dm_s2, axis)
            dm_s1 = lax.psum(dm_s1, axis)
            dm_w = lax.psum(dm_w, axis)
            new_m = m._replace(s2=m.s2 + dm_s2, s1=m.s1 + dm_s1,
                               w=m.w + dm_w)
            n_accepted = lax.psum(jnp.sum(accepted.astype(jnp.int32)), axis)
            new_count = count + n_accepted

            crossed = (new_count // period) > (count // period)

            def reestimate(args):
                mm, pl = args
                sol = plane_fit.solve(mm)
                new_hint = jnp.where(sol.valid, sol.normal, mm.normal_hint)
                recentered = geom.plane_from_normal_point(
                    mm.normal_hint, sol.centroid)
                return mm._replace(normal_hint=new_hint), \
                    jnp.where(sol.valid, sol.plane, recentered)

            new_m, new_plane = jax.lax.cond(
                crossed, reestimate, lambda a: a, (new_m, plane))
            next_frontier = jnp.where(crossed, new_member, accepted)
            active = (n_accepted > 0) | crossed
            return (new_member, next_frontier, new_plane, new_m, new_count,
                    it + 1, active)

        member, _, plane, m, count, _, _ = jax.lax.while_loop(
            cond, body,
            (member0, frontier0, plane0, m0, jnp.int32(0), jnp.int32(0),
             jnp.bool_(True)))
        return member, plane, m, count

    def attempt_cond(state):
        regions, consumed, attempts = state
        seed_labels = _gather_seed_values(
            regions.labels, seed_indices, h, w_local, axis)
        available = seed_valid & ~consumed & (seed_labels == UNLABELED)
        return jnp.any(available) & (attempts < max_attempts) \
            & (regions.num_regions < r_cap)

    def attempt_body(state):
        regions, consumed, attempts = state
        seed_labels = _gather_seed_values(
            regions.labels, seed_indices, h, w_local, axis)
        available = seed_valid & ~consumed & (seed_labels == UNLABELED)
        pos = jnp.where(available, seed_order, -1)
        pick = jnp.argmax(pos)
        seed_idx = seed_indices[pick]
        consumed = consumed.at[pick].set(True)

        member, plane, m, count = grow_one(regions.labels, seed_idx)
        accept = count >= min_inliers
        rid = regions.num_regions
        label_val = jnp.where(accept, rid + initial_id_offset,
                              jnp.int32(EXAMINED))
        new_labels = jnp.where(member, label_val, regions.labels)
        sol = plane_fit.solve(m._replace(normal_hint=plane[:3]))

        def write(r):
            return r._replace(
                num_regions=rid + 1,
                planes=r.planes.at[rid].set(
                    jnp.where(sol.valid, sol.plane, plane)),
                centroids=r.centroids.at[rid].set(sol.centroid),
                curvatures=r.curvatures.at[rid].set(sol.curvature),
                counts=r.counts.at[rid].set(count),
                seed_indices=r.seed_indices.at[rid].set(seed_idx),
                moments=plane_fit.PlaneMoments(
                    s2=r.moments.s2.at[rid].set(m.s2),
                    s1=r.moments.s1.at[rid].set(m.s1),
                    w=r.moments.w.at[rid].set(m.w),
                    normal_hint=r.moments.normal_hint.at[rid].set(
                        m.normal_hint)),
            )

        regions = jax.lax.cond(
            accept, write, lambda r: r, regions._replace(labels=new_labels))
        return regions, consumed, attempts + 1

    regions, consumed, attempts = jax.lax.while_loop(
        attempt_cond, attempt_body,
        (regions0, jnp.zeros((s,), bool), jnp.int32(0)))

    final_labels = jnp.where(regions.labels == EXAMINED, UNLABELED,
                             regions.labels)
    overflow = (attempts >= max_attempts) | (regions.num_regions >= r_cap)
    return regions._replace(labels=final_labels, overflow=overflow)


def sharded_connected_components(points_local, eligible_local,
                                 squared_threshold, half_window,
                                 h, w, axis, max_rounds=128):
    """Column-sharded gated CCL: local min-propagation with halo exchange,
    then a global pointer-jump per round via all_gather (the 'global label
    unification via collectives' of BASELINE config 5)."""
    w_local = points_local.shape[1]
    big = jnp.int32(h * w)
    shard = lax.axis_index(axis)
    k = half_window

    pp = exchange_halo(points_local, k, axis, fill=jnp.nan)
    ep = exchange_halo(eligible_local, k, axis, fill=False)

    offsets = [(dr, dc)
               for dc in range(-k, k + 1)
               for dr in range(-k, k + 1)
               if (dr, dc) != (0, 0)]
    gates = []
    for dr, dc in offsets:
        q = _shift(pp, -dr, -dc, jnp.nan)
        d2 = jnp.sum(jnp.square(q - pp), axis=-1)
        ok = (d2 < squared_threshold) & ep & _shift(ep, -dr, -dc, False)
        gates.append(crop_halo(ok, k))

    # init: global col-major index of each local cell
    rows = lax.broadcasted_iota(jnp.int32, (h, w_local), 0)
    cols = lax.broadcasted_iota(jnp.int32, (h, w_local), 1) \
        + shard * w_local
    init = jnp.where(eligible_local, cols * h + rows, big)

    def lookup_global(full, idx):
        r = idx % h
        c = idx // h
        flat = full.reshape(-1)
        safe = jnp.clip(r * w + c, 0, h * w - 1)
        out = flat[safe.reshape(-1)].reshape(idx.shape)
        return jnp.where(idx >= h * w, big, out)

    def one_round(labels):
        lp = exchange_halo(labels, k, axis, fill=big)
        new = labels
        for (dr, dc), gate in zip(offsets, gates):
            nb = crop_halo(_shift(lp, -dr, -dc, big), k)
            new = jnp.minimum(new, jnp.where(gate, nb, big))
        full = _ungather(lax.all_gather(new, axis), h, w)
        for _ in range(2):
            jumped = lookup_global(full, new)
            new = jnp.where(eligible_local, jnp.minimum(new, jumped), big)
            full = _ungather(lax.all_gather(new, axis), h, w)
        return new

    def cond(state):
        labels, prev, it = state
        changed = lax.psum(
            jnp.sum((labels != prev).astype(jnp.int32)), axis) > 0
        return (it < max_rounds) & changed

    def body(state):
        labels, _, it = state
        return one_round(labels), labels, it + 1

    first = one_round(init)
    labels, _, _ = jax.lax.while_loop(cond, body, (first, init, jnp.int32(1)))
    return labels


class ShardedStepResult(NamedTuple):
    labels: jnp.ndarray          # [H, W] final combined label grid
    normals: jnp.ndarray         # [H, W, 3]
    planar: planar_model.PlanarRegions  # replicated region table
    num_clusters: jnp.ndarray


def build_sharded_segment_step(mesh: Mesh,
                               normals_params=ComputeNormalsParams(),
                               seed_params=SeedsFromPlaneSupportParams(),
                               planar_config=PlanarRegionConfig(),
                               cluster_config=ClusterRegionConfig(),
                               max_attempts: int = 64,
                               axis: str = "space"):
    """jitted (points [H, W, 3], sensor_origin [3]) -> ShardedStepResult.

    The full device forward — normals, seed ranking, planar growth,
    euclidean clustering — sharded over grid columns on ``mesh``.
    """
    n = mesh.shape[axis]

    def step(points_local, sensor_origin):
        h = points_local.shape[0]
        w_local = points_local.shape[1]
        w = w_local * n

        nrm = sharded_normals(points_local, sensor_origin, normals_params,
                              axis)
        seed_idx, seed_valid = sharded_plane_support_seeds(
            points_local, nrm, seed_params, h, w, axis)
        labels0 = jnp.full((h, w_local), UNLABELED, jnp.int32)
        regions = sharded_grow_planar_regions(
            points_local, nrm, labels0, seed_idx, seed_valid, planar_config,
            h, w, axis, 0, max_attempts)

        eligible = (regions.labels == UNLABELED) \
            & jnp.all(jnp.isfinite(points_local), axis=-1)
        roots = sharded_connected_components(
            points_local, eligible,
            jnp.asarray(cluster_config.squared_distance_threshold,
                        points_local.dtype),
            cluster_config.half_search_window, h, w, axis)

        # replicated cluster id assignment from the gathered root grid
        roots_full = _ungather(lax.all_gather(roots, axis), h, w)
        elig_full = _ungather(lax.all_gather(eligible, axis), h, w)
        sizes = jax.ops.segment_sum(
            elig_full.astype(jnp.int32).reshape(-1),
            roots_full.reshape(-1), num_segments=h * w + 1)[:h * w]
        accepted = sizes >= cluster_config.min_region_inliers
        # dense ids by ascending root index (earliest-seed order when every
        # point seeds in ascending col-major order)
        order = jnp.cumsum(accepted.astype(jnp.int32)) - 1
        cluster_id_full = jnp.where(
            (roots_full < h * w) & elig_full
            & accepted[jnp.clip(roots_full, 0, h * w - 1)],
            order[jnp.clip(roots_full, 0, h * w - 1)], -1)
        num_clusters = jnp.sum(accepted.astype(jnp.int32))

        labels_full = _ungather(lax.all_gather(regions.labels, axis), h, w)
        combined = jnp.where(cluster_id_full >= 0,
                             cluster_id_full + regions.num_regions,
                             labels_full)
        nrm_full = _ungather(lax.all_gather(nrm, axis), h, w)
        # the region table is replicated (psum-derived); expose the full
        # label grid in it as well so the result is shard-agnostic
        regions_out = regions._replace(labels=labels_full)
        return ShardedStepResult(labels=combined, normals=nrm_full,
                                 planar=regions_out,
                                 num_clusters=num_clusters)

    replicated_planar_spec = planar_model.PlanarRegions(
        labels=P(), num_regions=P(), planes=P(), centroids=P(),
        curvatures=P(), counts=P(), seed_indices=P(),
        moments=plane_fit.PlaneMoments(s2=P(), s1=P(), w=P(),
                                       normal_hint=P()),
        overflow=P())
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=ShardedStepResult(
            labels=P(), normals=P(), planar=replicated_planar_spec,
            num_clusters=P()),
        check_vma=False)
    return jax.jit(sharded)
