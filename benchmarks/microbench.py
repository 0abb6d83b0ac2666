#!/usr/bin/env python
"""On-chip micro-benchmarks of the pipeline's inner ops.

Each op runs ``reps`` times inside one jitted fori_loop with an
iteration-dependent perturbation (so the relay cannot result-cache), and
the per-op time is the slope between reps=R and reps=2R — this cancels the
~25 ms dispatch floor and the input H2D time (see CLAUDE.md roofline).

Usage: python benchmarks/microbench.py [--hw 480x640]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def slope_time(name, make_looped, reps=32, iters=3):
    """make_looped(reps) -> jitted f(x_tuple, salt) returning a scalar."""
    f1 = make_looped(reps)
    f2 = make_looped(2 * reps)

    def run(f):
        best = None
        for i in range(iters):
            s = jnp.float32(i + 1)
            t0 = time.perf_counter()
            _ = np.asarray(f(s))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    t1, t2 = run(f1), run(f2)
    per_op = (t2 - t1) / reps
    print(f"{name:36s} {per_op * 1e3:9.3f} ms/op   (R={t1 * 1e3:.0f}ms "
          f"2R={t2 * 1e3:.0f}ms)")
    return per_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=str, default="480x640")
    args = ap.parse_args()
    h, w = (int(x) for x in args.hw.split("x"))

    from pcseg_tpu.models import planar_batched as pb
    from pcseg_tpu.models.config import (ComputeNormalsParams,
                                         SeedsFromPlaneSupportParams)
    from pcseg_tpu.ops import geom, plane_fit
    from pcseg_tpu.ops import normals as normals_op
    from pcseg_tpu.ops import seeds as seeds_op
    from pcseg_tpu.utils.synthetic import synthetic_room_cloud

    pts_np, origin_np = synthetic_room_cloud(h, w, f=float(h), seed=1)
    pts = jnp.asarray(np.nan_to_num(pts_np))  # finite variant for math ops
    origin = jnp.asarray(origin_np)
    print(f"grid {h}x{w}, device {jax.devices()[0]}")

    def looped(op, init_fn, reps):
        """Build f(salt): fori_loop of op, perturbed per iteration."""
        def f(salt):
            x0 = init_fn(salt)

            def body(i, carry):
                return op(carry, salt + i.astype(jnp.float32) * 1e-6)

            out = jax.lax.fori_loop(0, reps, body, x0)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out, 0.0)
        return jax.jit(f)

    # -- shifted distance step (normals inner op) -----------------------------
    def dir_step(x, s):
        q = jnp.pad(x + s * 0, ((1, 0), (0, 0), (0, 0)))[:h]
        d2 = jnp.sum((q - x) ** 2, -1)
        return x + jnp.where((d2 > 0.01) & (d2 < 1.0), s, 0.0)[..., None]
    slope_time("dir-step [H,W,3] pad+d2",
               lambda r: looped(dir_step, lambda s: pts + s, r))

    # -- full normals pass -----------------------------------------------------
    ncfg = ComputeNormalsParams()
    def normals_once(x, s):
        n = normals_op.compute_normals_organized(x, origin, ncfg)
        return x + jnp.nan_to_num(n) * 1e-9 + s * 1e-9
    slope_time("normals full pass",
               lambda r: looped(normals_once, lambda s: pts + s, r), reps=4)

    # -- eigensolve alone ------------------------------------------------------
    def eig_once(m, s):
        cov = m
        vec, lam = geom.eigh3x3_smallest(cov)
        return m + vec[..., None] * 1e-9 + s * 1e-9
    cov0 = jnp.eye(3, dtype=jnp.float32) + jnp.zeros((h, w, 3, 3))
    slope_time("eigh3x3 [H,W]",
               lambda r: looped(eig_once, lambda s: cov0 + s * 1e-3, r),
               reps=8)

    # -- seeds window count ----------------------------------------------------
    scfg = SeedsFromPlaneSupportParams()
    nrm0 = normals_op.compute_normals_organized(pts, origin, ncfg)
    nrm0 = jnp.nan_to_num(nrm0)
    def seeds_once(x, s):
        rk = seeds_op.seeds_from_plane_support(x, nrm0, scfg)
        return x + rk.count[..., None].astype(jnp.float32) * 1e-12 + s * 0
    slope_time("seeds full pass",
               lambda r: looped(seeds_once, lambda s: pts + s, r), reps=4)

    # -- packed flood round ----------------------------------------------------
    k = 64
    gate_b = jnp.asarray(
        np.random.RandomState(0).rand(k, h, w) < 0.6)
    g = pb._pack_bits(gate_b)
    ng = ~g
    def flood_round(rch, s):
        rch = pb._segmented_or_spread_packed(rch, g, ng, -1)
        rch = pb._segmented_or_spread_packed(rch, g, ng, -2)
        return rch ^ (s > 1e9).astype(jnp.uint32)
    src0 = pb._pack_bits(jnp.asarray(
        np.random.RandomState(1).rand(k, h, w) < 0.01) & gate_b)
    slope_time("flood round packed [2,H,W]",
               lambda r: looped(flood_round, lambda s: src0 + (s > 1e9), r))

    # -- claims_of-style argmin over K ----------------------------------------
    rank = jnp.arange(k, dtype=jnp.int32)
    def claims_once(x, s):
        rg = jnp.where(gate_b, rank[:, None, None], 2**31 - 1)
        best = jnp.min(rg + x.astype(jnp.int32)[None], axis=0)
        return x + (best & 1) + (s > 1e9)
    z0 = jnp.zeros((h, w), jnp.int32)
    slope_time("min over K [64,H,W] int32",
               lambda r: looped(claims_once,
                                lambda s: z0 + (s > 1e9).astype(jnp.int32),
                                r))

    # -- dist einsum [K,H,W] ----------------------------------------------------
    planes = jnp.asarray(np.random.RandomState(2).randn(k, 4), jnp.float32)
    def dist_once(x, s):
        d = jnp.abs(jnp.einsum("kc,hwc->khw", planes[:, :3], x,
                               precision=jax.lax.Precision.HIGHEST)
                    + planes[:, 3][:, None, None])
        return x + jnp.min(d, axis=0)[..., None] * 1e-9 + s * 0
    slope_time("dist einsum [K,H,W] HIGHEST",
               lambda r: looped(dist_once, lambda s: pts + s, r))

    # -- CCL round (segmented min + 8 offsets) ---------------------------------
    from pcseg_tpu.ops import connectivity as conn
    elig = jnp.asarray(np.isfinite(pts_np).all(-1))
    offsets = [(dr, dc) for dc in (-1, 0, 1) for dr in (-1, 0, 1)
               if (dr, dc) != (0, 0)]
    gates = []
    pj = jnp.asarray(pts_np)
    for dr, dc in offsets:
        q = conn._shift2(pj, dr, dc, jnp.nan)
        d2 = jnp.sum(jnp.square(q - pj), axis=-1)
        gates.append((d2 < 1.0) & elig & conn._shift2(elig, dr, dc, False))
    row_edge = gates[offsets.index((0, -1))]
    col_edge = gates[offsets.index((-1, 0))]
    big = jnp.int32(h * w)
    def ccl_round(lbl, s):
        lbl = conn._segmented_min_scan(lbl, row_edge, axis=1, big=h * w)
        lbl = conn._segmented_min_scan(lbl, col_edge, axis=0, big=h * w)
        for (dr, dc), gate in zip(offsets, gates):
            nb = conn._shift2(lbl, dr, dc, big)
            lbl = jnp.minimum(lbl, jnp.where(gate, nb, big))
        return lbl + (s > 1e9).astype(jnp.int32)
    lbl0 = jnp.where(elig, conn.colmajor_index_grid(h, w), big)
    slope_time("ccl round [H,W] int32",
               lambda r: looped(ccl_round,
                                lambda s: lbl0 + (s > 1e9).astype(jnp.int32),
                                r))


if __name__ == "__main__":
    main()
