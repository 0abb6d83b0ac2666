#!/usr/bin/env python
"""Per-stage DEVICE-COMPUTE breakdown of the batched (B-frame) forward.

Each stage is wrapped to return a tiny scalar checksum, so the timed loop
excludes the tunnel's D2H cost of bulk outputs (~40-75 MB/s through the
relay) and the ~25 ms dispatch floor amortizes over the batch. Inputs
perturbed per iteration + forced scalar D2H per iteration (relay
result-caches identical computations; see CLAUDE.md).

Writes benchmarks/profile_batched.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "profile_batched.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=str, default="480x640")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--stages", type=str, default="all")
    args = ap.parse_args()
    h, w = (int(x) for x in args.hw.split("x"))
    B = args.batch

    import jax
    import jax.numpy as jnp
    from pcseg_tpu.models import cluster, pipeline, planar_batched
    from pcseg_tpu.models.config import UNLABELED
    from pcseg_tpu.ops import normals as normals_op
    from pcseg_tpu.ops import seeds as seeds_op
    from pcseg_tpu.utils.synthetic import synthetic_room_cloud

    print(f"backend {jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()
    _ = np.asarray(jnp.ones((8, 8)).sum())
    print(f"probe {time.perf_counter() - t0:.1f}s", flush=True)

    pts_np, origin_np = synthetic_room_cloud(h, w, f=float(h), seed=1)
    origin = jnp.asarray(origin_np)
    rng = np.random.default_rng(3)

    def batch_pts(i):
        jit = rng.normal(0, 1e-4, (B, 1, 1, 1)).astype(np.float32)
        a = jnp.asarray(pts_np[None] + jit + np.float32(i * 1e-5))
        a.block_until_ready()
        return a

    seg = pipeline.Segmenter(pipeline.SegmenterConfig())
    cfg = seg.config
    results = {"hw": [h, w], "batch": B}

    def checksum(tree):
        leaves = [x for x in jax.tree_util.tree_leaves(tree)
                  if hasattr(x, "dtype")]
        tot = jnp.zeros((), jnp.float32)
        for leaf in leaves:
            tot = tot + jnp.sum(leaf.astype(jnp.float32) * 0 + 1) * 0 \
                + jnp.sum(jnp.nan_to_num(leaf.astype(jnp.float32),
                                         posinf=1e6, neginf=-1e6))
        return tot

    def timeit(name, fn, make_args, iters=args.iters):
        f = jax.jit(lambda *a: checksum(fn(*a)))
        t0 = time.perf_counter()
        _ = np.asarray(f(*make_args(0)))
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(iters):
            a = make_args(i + 1)
            t0 = time.perf_counter()
            _ = np.asarray(f(*a))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{name:28s} {best * 1e3:9.1f} ms/batch "
              f"({best * 1e3 / B:7.2f} ms/frame)  compile {compile_s:.0f}s  "
              + " ".join(f"{t * 1e3:.0f}" for t in times), flush=True)
        results[name] = {"ms_batch": best * 1e3, "ms_frame": best * 1e3 / B,
                         "compile_s": compile_s}
        with open(OUT, "w") as f2:
            json.dump(results, f2, indent=2)

    stages = args.stages.split(",") if args.stages != "all" else [
        "normals", "normals_variants", "seeds", "grow", "cluster", "full"]

    vnorm = jax.vmap(lambda p: normals_op.compute_normals_organized(
        p, origin, cfg.normals))
    if "normals" in stages:
        timeit("normals", vnorm, lambda i: (batch_pts(i),))

    if "normals_variants" in stages:
        import dataclasses
        cfg_k8 = dataclasses.replace(cfg.normals, max_scan_steps=8)
        timeit("normals_k8", jax.vmap(
            lambda p: normals_op.compute_normals_organized(p, origin,
                                                           cfg_k8)),
               lambda i: (batch_pts(i),))
        cfg_nd = dataclasses.replace(cfg.normals,
                                     include_diagonal_neighbors=False)
        timeit("normals_nodiag", jax.vmap(
            lambda p: normals_op.compute_normals_organized(p, origin,
                                                           cfg_nd)),
               lambda i: (batch_pts(i),))
        # support only (scan + moments, no eigensolve)
        timeit("normals_support_only", jax.vmap(
            lambda p: normals_op.find_normal_support(p, cfg.normals)),
               lambda i: (batch_pts(i),))

    nrm = jax.jit(vnorm)(batch_pts(0))
    nrm.block_until_ready()

    vseeds = jax.vmap(lambda p, n: seeds_op.seeds_from_plane_support(
        p, n, cfg.plane_support_seeds))
    if "seeds" in stages:
        timeit("seeds", vseeds, lambda i: (batch_pts(i), nrm))

    ranked = jax.jit(vseeds)(batch_pts(0), nrm)
    labels0 = jnp.full((h, w), UNLABELED, jnp.int32)

    vgrow = jax.vmap(
        lambda p, n, si, sv: planar_batched.grow_planar_regions_batched(
            p, n, labels0, si, sv, cfg.planar, 0))
    if "grow" in stages:
        timeit("grow", vgrow,
               lambda i: (batch_pts(i), nrm, ranked.indices, ranked.valid))

    if "cluster" in stages:
        hw_n = h * w
        seed_vec = jnp.arange(hw_n - 1, -1, -1, dtype=jnp.int32)
        lab = jax.jit(jax.vmap(
            lambda p, n, si, sv: planar_batched.grow_planar_regions_batched(
                p, n, labels0, si, sv, cfg.planar, 0).labels))(
            batch_pts(0), nrm, ranked.indices, ranked.valid)
        lab.block_until_ready()
        vclu = jax.vmap(lambda p, l: cluster.segment_clusters(
            p, l, seed_vec, cfg.cluster, 0))
        timeit("cluster", vclu, lambda i: (batch_pts(i), lab))

    if "full" in stages:
        vfull = jax.vmap(lambda p: seg._forward_impl(p, origin)[0])
        timeit("full", vfull, lambda i: (batch_pts(i),))


if __name__ == "__main__":
    main()
