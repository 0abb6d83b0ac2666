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

    Local windowed counts with halo = window//2, then each shard keeps its
    local top-``max_seeds`` candidates and only THOSE are all-gathered
    (O(n * max_seeds) ints instead of the full O(H * W) count grid); the
    global top-``max_seeds`` is a subset of the per-shard top lists, so
    the merged replicated ranking is exactly rank_plane_support_seeds'.
    """
    half = params.neighborhood_size // 2
    max_seeds = params.max_seeds
    pp = exchange_halo(points_local, half, axis, fill=jnp.nan)
    np_ = exchange_halo(normals_local, half, axis, fill=jnp.nan)
    count_pad, ok_pad = seeds_op.plane_support_counts(pp, np_, params)
    count = crop_halo(count_pad, half)
    ok = crop_halo(ok_pad, half)

    w_local = count.shape[1]
    shard = lax.axis_index(axis)
    rows = lax.broadcasted_iota(jnp.int32, (h, w_local), 0)
    cols = lax.broadcasted_iota(jnp.int32, (h, w_local), 1) \
        + shard * w_local
    lin = cols * h + rows
    qualifies = ok & (count >= params.min_num_support_points)
    # same key as rank_plane_support_seeds: (count asc, col-major lin asc)
    key = jnp.where(qualifies, count * (h * w) + lin, -1).reshape(-1)
    m_local = min(max_seeds, key.shape[0])
    kk, ii = lax.top_k(key, m_local)                 # descending
    lin_k = lin.reshape(-1)[ii]

    keys_all = lax.all_gather(kk, axis).reshape(-1)
    lins_all = lax.all_gather(lin_k, axis).reshape(-1)
    k2 = min(max_seeds, keys_all.shape[0])
    kk2, jj = lax.top_k(keys_all, k2)                # global top, descending
    # final vector ascending (driver pops back-to-front -> best first),
    # front-padded with invalid entries when fewer than max_seeds exist
    pad = max_seeds - k2
    indices = jnp.concatenate(
        [jnp.zeros((pad,), jnp.int32), lins_all[jj][::-1]])
    valid = jnp.concatenate(
        [jnp.zeros((pad,), bool), (kk2 >= 0)[::-1]])
    return jnp.where(valid, indices, 0), valid


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


def _sharded_flood_packed(gate, sources, axis, rounds, max_run=None,
                          global_rounds=16):
    """Cross-shard batched flood fill on packed bit-planes.

    gate/sources: [K, H, W_local] bool (columns sharded over ``axis``).
    Per global round: local segmented-scan flood to its fixed point
    (models/planar_batched.flood_fill_static's body), then a ONE-COLUMN
    halo exchange ORs boundary reach into the neighbors — comm volume
    O(NW * H) per round instead of any full-grid gather. Global rounds
    needed = number of times the region winds across shard boundaries.
    """
    from pcseg_tpu.models import planar_batched as pb

    g = pb._pack_bits(gate)
    not_g = ~g
    reach0 = pb._pack_bits(sources & gate)

    def local_round(reach):
        reach = pb._segmented_or_spread_packed(reach, g, not_g, -1, max_run)
        return pb._segmented_or_spread_packed(reach, g, not_g, -2, max_run)

    def local_flood(reach):
        def cond(st):
            r, prev, it = st
            return (it < rounds) & jnp.any(r != prev)

        def body(st):
            r, _, it = st
            return local_round(r), r, it + 1

        first = local_round(reach)
        r, _, _ = jax.lax.while_loop(cond, body, (first, reach, jnp.int32(1)))
        return r

    def exchange(reach):
        padded = exchange_halo(reach, 1, axis, fill=0, axis=2)
        incoming_left = padded[..., 0]     # neighbor's right edge column
        incoming_right = padded[..., -1]   # neighbor's left edge column
        reach = reach.at[..., 0].set(
            reach[..., 0] | (incoming_left & g[..., 0]))
        reach = reach.at[..., -1].set(
            reach[..., -1] | (incoming_right & g[..., -1]))
        return reach

    def gcond(st):
        r, prev, it = st
        changed = lax.psum(jnp.sum((r != prev).astype(jnp.int32)), axis) > 0
        return (it < global_rounds) & changed

    def gbody(st):
        r, _, it = st
        return exchange(local_flood(r)), r, it + 1

    first = exchange(local_flood(reach0))
    reach, _, _ = jax.lax.while_loop(gcond, gbody,
                                     (first, reach0, jnp.int32(1)))
    # last exchange may have seeded edge cells; flood them locally
    reach = local_flood(reach)
    return pb._unpack_bits(reach, gate.shape[0])


def sharded_grow_planar_regions_batched(
        points_local, normals_local, labels_local,
        seed_indices, seed_valid,
        config: PlanarRegionConfig,
        h, w, axis,
        initial_id_offset: int = 0,
        flood_rounds: int = 8,
        founder_epochs: int = 3,
        refine_epochs: int = 1,
        radii_base: int = 8):
    """Column-sharded port of models/planar_batched.py — the PRODUCTION
    batched grower on a device mesh (multi-chip uses the fast path, not the
    sequential wavefront).

    Slot tables (seed, rank, alive, plane, hint) are replicated; member
    masks are column shards. Cross-shard pieces: flood = one-column halo
    exchanges (_sharded_flood_packed), plane refits = psum of the moment
    matmul (exact — merge algebra is addition), member counts / seed
    ownership / coplanar-merge statistics = psums. Every replicated
    computation is identical on all shards, so the while_loops stay in
    lockstep. Semantics mirror the single-device batched grower
    epoch-for-epoch; see planar_batched.py for the algorithm notes.
    """
    from pcseg_tpu.models import planar_batched as pb

    w_local = points_local.shape[1]
    hw_local = h * w_local
    dtype = points_local.dtype
    k_cap = config.max_regions
    tau = jnp.asarray(config.max_plane_distance, dtype)
    inf_rank = jnp.int32(2**31 - 1)
    shard = lax.axis_index(axis)

    s = seed_indices.shape[0]
    seed_rank = (s - 1) - jnp.arange(s, dtype=jnp.int32)

    eligible0 = labels_local == UNLABELED

    seed_r = seed_indices % h
    seed_c = jnp.clip(seed_indices // h, 0, w - 1)

    def gather_seed(grid_local, fill=0):
        """grid_local [H, W_local(, C)] at global seeds -> [S(, C)]."""
        return _gather_seed_values(grid_local, seed_indices, h, w_local,
                                   axis)

    seed_pt = gather_seed(points_local * 1.0)
    seed_nm = gather_seed(normals_local * 1.0)
    seed_elig = gather_seed(eligible0.astype(jnp.int32)) > 0
    seed_ok = (seed_valid & seed_elig
               & jnp.all(jnp.isfinite(seed_nm), axis=-1)
               & jnp.all(jnp.isfinite(seed_pt), axis=-1))
    # NaN seed coordinates poison psums of gathered values: zero them
    seed_pt = jnp.where(seed_ok[:, None], jnp.nan_to_num(seed_pt), 0.0)
    seed_nm = jnp.where(seed_ok[:, None], jnp.nan_to_num(seed_nm), 0.0)

    slots = pb._Slots(
        seed_idx=jnp.zeros((k_cap,), jnp.int32),
        rank=jnp.full((k_cap,), inf_rank),
        alive=jnp.zeros((k_cap,), bool),
        plane=jnp.zeros((k_cap, 4), dtype),
        hint=jnp.zeros((k_cap, 3), dtype).at[:, 0].set(1.0),
        members=jnp.zeros((k_cap, h, w_local), bool),
    )

    def claims_of(members, rank):
        rank_grid = jnp.where(members, rank[:, None, None], inf_rank)
        best = jnp.min(rank_grid, axis=0)
        claim = jnp.argmin(rank_grid, axis=0).astype(jnp.int32)
        claim = jnp.where(best < inf_rank, claim, k_cap)
        new_members = members & (
            claim[None] == jnp.arange(k_cap, dtype=jnp.int32)[:, None, None])
        return claim, new_members

    def local_cols(c_glob):
        """global col index [K] -> (local col [K], owned [K])."""
        c_local = c_glob - shard * w_local
        owned = (c_local >= 0) & (c_local < w_local)
        return jnp.clip(c_local, 0, w_local - 1), owned

    def member_at_seed(members, slot_seed_idx):
        """[K] bool: does slot k's member mask contain its own seed?"""
        sr = slot_seed_idx % h
        sc, owned = local_cols(jnp.clip(slot_seed_idx // h, 0, w - 1))
        vals = members[jnp.arange(k_cap), sr, sc] & owned
        return lax.psum(vals.astype(jnp.int32), axis) > 0

    def covered_at_seeds(covered):
        return _gather_seed_values(covered.astype(jnp.int32), seed_indices,
                                   h, w_local, axis) > 0

    def assign_founders(slots, covered):
        seed_covered = covered_at_seeds(covered)
        taken = jnp.zeros((s,), bool)
        alive_seed = jnp.where(slots.alive, slots.seed_idx, -1)
        for k in range(k_cap):
            taken = taken | (seed_indices == alive_seed[k])
        avail = seed_ok & ~seed_covered & ~taken
        key = jnp.where(avail, seed_rank, inf_rank)
        order = jnp.argsort(key)
        free = ~slots.alive
        free_pos = jnp.cumsum(free.astype(jnp.int32)) - 1
        cand_rank = key[order]
        cand_idx = seed_indices[order]
        cand_pt = seed_pt[order]
        cand_nm = seed_nm[order]
        take = free & (free_pos < s)
        pick = jnp.clip(free_pos, 0, s - 1)
        new_seed = jnp.where(take, cand_idx[pick], slots.seed_idx)
        newly = take & (cand_rank[pick] < inf_rank)
        npt = cand_pt[pick]
        nnm = cand_nm[pick]
        plane0 = geom.plane_from_normal_point(nnm, npt)
        nr = new_seed % h
        nc, owned = local_cols(jnp.clip(new_seed // h, 0, w - 1))
        onehot = (jnp.zeros((k_cap, h, w_local), bool)
                  .at[jnp.arange(k_cap), nr, nc].set(owned))
        return pb._Slots(
            seed_idx=new_seed,
            rank=jnp.where(newly, cand_rank[pick], slots.rank),
            alive=slots.alive | newly,
            plane=jnp.where(newly[:, None], plane0, slots.plane),
            hint=jnp.where(newly[:, None], nnm, slots.hint),
            members=jnp.where(newly[:, None, None], onehot, slots.members),
        )

    pts_safe = jnp.where(jnp.isfinite(points_local), points_local, 0.0)
    px, py, pz = pts_safe[..., 0], pts_safe[..., 1], pts_safe[..., 2]
    feat = jnp.stack([px * px, px * py, px * pz, py * py, py * pz, pz * pz,
                      px, py, pz, jnp.ones_like(px)],
                     axis=-1).reshape(hw_local, 10)

    def refit(slots):
        wts = slots.members.astype(dtype).reshape(k_cap, hw_local)
        sums = jnp.dot(wts, feat, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        sums = lax.psum(sums, axis)  # exact: merge algebra is addition
        m = plane_fit.PlaneMoments(s2=sums[:, :6], s1=sums[:, 6:9],
                                   w=sums[:, 9], normal_hint=slots.hint)
        sol = plane_fit.solve(m)
        recentered = geom.plane_from_normal_point(slots.hint, sol.centroid)
        new_plane = jnp.where(sol.valid[:, None], sol.plane, recentered)
        new_hint = jnp.where(sol.valid[:, None], sol.normal, slots.hint)
        return slots._replace(plane=new_plane, hint=new_hint), m, sol

    rows_grid = lax.broadcasted_iota(jnp.int32, (h, w_local), 0)
    cols_grid = lax.broadcasted_iota(jnp.int32, (h, w_local), 1) \
        + shard * w_local

    def seed_box(slots, radius):
        if radius is None:
            return jnp.ones((k_cap, h, w_local), bool)
        sr = slots.seed_idx % h
        sc = jnp.clip(slots.seed_idx // h, 0, w - 1)
        return ((jnp.abs(rows_grid[None] - sr[:, None, None]) <= radius)
                & (jnp.abs(cols_grid[None] - sc[:, None, None]) <= radius))

    def epoch(slots, assign, radius=None, rounds=None):
        covered = jnp.any(slots.members, axis=0)
        if assign:
            slots = assign_founders(slots, covered)
        claim, members = claims_of(slots.members, slots.rank)
        claim_rank = jnp.where(
            claim < k_cap,
            slots.rank[jnp.clip(claim, 0, k_cap - 1)], inf_rank)
        dist = jnp.abs(
            jnp.einsum("kc,hwc->khw", slots.plane[:, :3], points_local,
                       precision=jax.lax.Precision.HIGHEST)
            + slots.plane[:, 3][:, None, None])
        gate = (dist < tau) & eligible0[None] \
            & (claim_rank[None] >= slots.rank[:, None, None]) \
            & slots.alive[:, None, None] \
            & seed_box(slots, radius)
        gate = gate | members
        max_run = None if radius is None else 2 * radius + 1
        reach = _sharded_flood_packed(
            gate, members, axis,
            flood_rounds if rounds is None else rounds, max_run=max_run)
        _, new_members = claims_of(reach, slots.rank)
        counts = lax.psum(
            jnp.sum(new_members.astype(jnp.int32), axis=(1, 2)), axis)
        owns_seed = member_at_seed(new_members, slots.seed_idx)
        alive = slots.alive & (counts > 0) & owns_seed
        slots = slots._replace(
            members=new_members & alive[:, None, None],
            alive=alive)
        slots, _, _ = refit(slots)
        return slots

    def merge_coplanar_sharded(slots):
        """pb.merge_coplanar with psum'd adjacency/in-band statistics."""
        mem = slots.members.reshape(k_cap, hw_local).astype(dtype)
        counts = lax.psum(jnp.sum(mem, axis=1), axis)
        dil_local = (slots.members
                     | pb._shift_mask(slots.members, 1, 0)
                     | pb._shift_mask(slots.members, -1, 0)
                     | pb._shift_mask(slots.members, 0, 1)
                     | pb._shift_mask(slots.members, 0, -1))
        # horizontal dilation across the shard boundary
        padded = exchange_halo(slots.members, 1, axis, fill=False, axis=2)
        dil = dil_local | padded[..., :-2] | padded[..., 2:]
        adj = lax.psum(
            jnp.dot(dil.reshape(k_cap, hw_local).astype(dtype), mem.T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST), axis) > 0
        dist_all = jnp.abs(
            jnp.einsum("kc,hwc->khw", slots.plane[:, :3], points_local,
                       precision=jax.lax.Precision.HIGHEST)
            + slots.plane[:, 3][:, None, None])
        band = (dist_all < tau).reshape(k_cap, hw_local).astype(dtype)
        in_band = lax.psum(
            jnp.dot(mem, band.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST), axis)
        frac = in_band / jnp.maximum(counts, 1.0)[:, None]
        alive2 = slots.alive[:, None] & slots.alive[None, :]
        link = alive2 & adj & ((frac >= 0.9) | (frac.T >= 0.9))
        link = link | jnp.eye(k_cap, dtype=bool)
        closure = link
        for _ in range(max(1, (k_cap - 1).bit_length())):
            closure = closure | (jnp.dot(
                closure.astype(dtype), closure.astype(dtype),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST) > 0)
        grp_rank = jnp.min(jnp.where(closure, slots.rank[None, :],
                                     inf_rank), axis=1)
        winner = jnp.argmin(jnp.where(closure, slots.rank[None, :],
                                      inf_rank), axis=1).astype(jnp.int32)
        is_winner = winner == jnp.arange(k_cap, dtype=jnp.int32)
        g = (winner[None, :] == jnp.arange(k_cap,
                                           dtype=jnp.int32)[:, None])
        merged = jnp.einsum("ak,khw->ahw", g.astype(dtype),
                            slots.members.astype(dtype),
                            precision=jax.lax.Precision.HIGHEST) > 0
        has_any = lax.psum(
            jnp.sum(merged.reshape(k_cap, hw_local).astype(jnp.int32),
                    axis=1), axis) > 0
        alive = slots.alive & is_winner & has_any
        return slots._replace(
            members=jnp.where(alive[:, None, None], merged, False),
            alive=alive,
            rank=jnp.where(alive, grp_rank, slots.rank))

    total_epochs = founder_epochs + refine_epochs
    radii = [radii_base * (3 ** e) for e in range(total_epochs)]
    radii[-1] = None
    if total_epochs >= 2 and radii[-2] is not None \
            and radii[-2] < max(h, w):
        radii[-2] = None
    for e in range(total_epochs):
        rounds_e = flood_rounds if radii[e] is None \
            else min(flood_rounds, 4)
        slots = epoch(slots, assign=True, radius=radii[e], rounds=rounds_e)
    slots = merge_coplanar_sharded(slots)
    slots, _, _ = refit(slots)
    slots = epoch(slots, assign=True)

    claim, members = claims_of(slots.members, slots.rank)
    counts = lax.psum(
        jnp.sum(members.astype(jnp.int32), axis=(1, 2)), axis)
    accepted = slots.alive & (counts >= config.min_region_inliers)

    order = jnp.argsort(jnp.where(accepted, slots.rank, inf_rank))
    dense = jnp.cumsum(accepted[order].astype(jnp.int32)) - 1
    slot_id = jnp.full((k_cap,), -1, jnp.int32).at[order].set(
        jnp.where(accepted[order], dense, -1))
    num_regions = jnp.sum(accepted.astype(jnp.int32))

    claim_id = jnp.where(claim < k_cap,
                         slot_id[jnp.clip(claim, 0, k_cap - 1)], -1)
    new_labels = jnp.where(claim_id >= 0, claim_id + initial_id_offset,
                           labels_local)

    slots_f, m, sol = refit(slots)
    gather = jnp.argsort(jnp.where(slot_id >= 0, slot_id, k_cap))

    def take(a):
        return a[gather]

    member_any = jnp.any(members, axis=0)
    leftover = seed_ok & ~covered_at_seeds(member_any)
    return planar_model.PlanarRegions(
        labels=new_labels,
        num_regions=num_regions,
        planes=take(jnp.where(sol.valid[:, None], sol.plane, slots.plane)),
        centroids=take(sol.centroid),
        curvatures=take(sol.curvature),
        counts=take(counts),
        seed_indices=take(slots.seed_idx),
        moments=plane_fit.PlaneMoments(
            s2=take(m.s2), s1=take(m.s1), w=take(m.w),
            normal_hint=take(m.normal_hint)),
        overflow=jnp.any(leftover),
    )


def sharded_connected_components(points_local, eligible_local,
                                 squared_threshold, half_window,
                                 h, w, axis, max_rounds=128,
                                 uf_rounds: int = 16):
    """Column-sharded gated CCL — boundary-pair unification.

    1. Local gated CCL on each column shard to its fixed point, with
       labels seeded by GLOBAL col-major indices (ops/connectivity
       segmented min-scans; no communication).
    2. Cross-boundary equivalence pairs: for every gated window edge that
       crosses a shard boundary, the pair (local root, neighbor root) —
       O(H * k^2) pairs per shard (one k-column halo exchange), NOT the
       O(H * W * rounds) full-grid all_gathers of the naive scheme.
    3. One all_gather of the pair lists, then replicated union-find:
       scatter-min union rounds + pointer jumping on an [H*W] parent
       table (pure local compute), and a final root remap of the local
       labels. The per-root minimum over the union is exactly the global
       component minimum, so roots equal the single-device CCL's.

    Matches SURVEY §5's long-context/SP design (boundary-ring equivalence
    exchange + pointer jumping).
    """
    w_local = points_local.shape[1]
    hw = h * w
    big = jnp.int32(hw)
    shard = lax.axis_index(axis)
    k = half_window

    # --- 1. local CCL with global labels ------------------------------------
    rows = lax.broadcasted_iota(jnp.int32, (h, w_local), 0)
    cols = lax.broadcasted_iota(jnp.int32, (h, w_local), 1) \
        + shard * w_local
    init = cols * h + rows
    from pcseg_tpu.ops import connectivity
    labels = connectivity.connected_components_scan(
        points_local, eligible_local,
        jnp.asarray(squared_threshold, points_local.dtype), k,
        rounds=max_rounds, init_labels=init, big_value=hw)

    # --- 2. boundary equivalence pairs (rightward edges only; leftward
    # edges are the left neighbor's rightward ones) --------------------------
    pp = exchange_halo(points_local, k, axis, fill=jnp.nan)
    ep = exchange_halo(eligible_local, k, axis, fill=False)
    lp = exchange_halo(labels, k, axis, fill=big)

    pair_a = []
    pair_b = []
    for dc in range(1, k + 1):
        for dr in range(-k, k + 1):
            # source cells: the last dc local columns; target (r+dr, c+dc)
            # lives in the right halo
            src_pts = points_local[:, w_local - k:]
            src_lab = labels[:, w_local - k:]
            src_ok = eligible_local[:, w_local - k:]
            # padded coords of the same strip start at w_local (+k halo -k)
            dst_pts = _shift(pp, -dr, -dc, jnp.nan)[:, w_local:w_local + k]
            dst_lab = _shift(lp, -dr, -dc, big)[:, w_local:w_local + k]
            dst_ok = _shift(ep, -dr, -dc, False)[:, w_local:w_local + k]
            crosses = (lax.broadcasted_iota(jnp.int32, (h, k), 1)
                       + dc) >= k  # local col c = w_local-k+j; c+dc >= w_local
            d2 = jnp.sum(jnp.square(dst_pts - src_pts), axis=-1)
            ok = (d2 < squared_threshold) & src_ok & dst_ok & crosses
            pair_a.append(jnp.where(ok, src_lab, big).reshape(-1))
            pair_b.append(jnp.where(ok, dst_lab, big).reshape(-1))
    a = jnp.concatenate(pair_a)
    b = jnp.concatenate(pair_b)

    # --- 3. replicated union-find over the gathered pairs -------------------
    a_all = lax.all_gather(a, axis).reshape(-1)
    b_all = lax.all_gather(b, axis).reshape(-1)
    a_safe = jnp.clip(a_all, 0, hw - 1)
    b_safe = jnp.clip(b_all, 0, hw - 1)
    valid = (a_all < hw) & (b_all < hw)

    parent0 = jnp.arange(hw + 1, dtype=jnp.int32)

    def uf_cond(state):
        parent, prev, it = state
        return (it < uf_rounds) & jnp.any(parent != prev)

    def uf_body(state):
        parent, _, it = state
        pa = parent[jnp.where(valid, a_safe, hw)]
        pb = parent[jnp.where(valid, b_safe, hw)]
        m = jnp.minimum(pa, pb)
        parent = parent.at[pa].min(jnp.where(valid, m, hw))
        parent = parent.at[pb].min(jnp.where(valid, m, hw))
        # pointer jumping (path compression)
        parent = parent[parent]
        parent = parent[parent]
        return parent, state[0], it + 1

    first = uf_body((parent0, parent0, jnp.int32(0)))[0]
    parent, _, _ = jax.lax.while_loop(
        uf_cond, uf_body, (first, parent0, jnp.int32(1)))

    remapped = parent[jnp.clip(labels, 0, hw)]
    return jnp.where(eligible_local, remapped, big)


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
    Growth uses the production batched grower
    (sharded_grow_planar_regions_batched) when
    ``planar_config.growth_mode == 'batched'``; the sequential wavefront
    (sharded_grow_planar_regions) remains as the step-by-step parity
    reference for other modes.
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
        if planar_config.growth_mode == "batched":
            regions = sharded_grow_planar_regions_batched(
                points_local, nrm, labels0, seed_idx, seed_valid,
                planar_config, h, w, axis, 0)
        else:
            regions = sharded_grow_planar_regions(
                points_local, nrm, labels0, seed_idx, seed_valid,
                planar_config, h, w, axis, 0, max_attempts)

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
