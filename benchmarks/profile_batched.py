#!/usr/bin/env python
"""Per-stage wall-clock breakdown of the BATCHED (B-frame) device forward.

The single-frame profile (profile_stages.py) is dominated by the ~25 ms
relay dispatch floor; this harness vmaps each stage over B frames so the
floor amortizes and the per-frame device compute becomes visible. Inputs
perturbed per iteration + forced D2H per iteration (relay result-caches;
see CLAUDE.md).

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
        return jnp.asarray(pts_np[None] + jit + np.float32(i * 1e-5))

    seg = pipeline.Segmenter(pipeline.SegmenterConfig())
    cfg = seg.config
    results = {"hw": [h, w], "batch": B}

    def timeit(name, fn, make_args, iters=args.iters):
        t0 = time.perf_counter()
        out = fn(*make_args(0))
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "shape")]
        _ = np.asarray(leaves[0])
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(iters):
            a = make_args(i + 1)
            t0 = time.perf_counter()
            out = fn(*a)
            leaves = [x for x in jax.tree_util.tree_leaves(out)
                      if hasattr(x, "shape")]
            _ = np.asarray(leaves[0])
            for leaf in leaves[1:]:
                leaf.block_until_ready()
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{name:24s} {best * 1e3:9.1f} ms/batch "
              f"({best * 1e3 / B:7.2f} ms/frame)  compile {compile_s:.0f}s  "
              + " ".join(f"{t * 1e3:.0f}" for t in times), flush=True)
        results[name] = {"ms_batch": best * 1e3, "ms_frame": best * 1e3 / B,
                         "compile_s": compile_s}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
        return out

    stages = args.stages.split(",") if args.stages != "all" else [
        "normals", "seeds", "grow", "cluster", "full"]

    f_norm = jax.jit(jax.vmap(
        lambda p: normals_op.compute_normals_organized(p, origin,
                                                       cfg.normals)))
    if "normals" in stages:
        timeit("normals", f_norm, lambda i: (batch_pts(i),))

    nrm = f_norm(batch_pts(0))

    f_seeds = jax.jit(jax.vmap(
        lambda p, n: seeds_op.seeds_from_plane_support(
            p, n, cfg.plane_support_seeds)))
    if "seeds" in stages:
        timeit("seeds", f_seeds, lambda i: (batch_pts(i), nrm))

    ranked = f_seeds(batch_pts(0), nrm)
    labels0 = jnp.full((h, w), UNLABELED, jnp.int32)

    if "grow" in stages:
        f_grow = jax.jit(jax.vmap(
            lambda p, n, si, sv: planar_batched.grow_planar_regions_batched(
                p, n, labels0, si, sv, cfg.planar, 0)))
        dev = timeit("grow", f_grow,
                     lambda i: (batch_pts(i), nrm, ranked.indices,
                                ranked.valid))

    if "cluster" in stages:
        hw_n = h * w
        seed_vec = jnp.arange(hw_n - 1, -1, -1, dtype=jnp.int32)
        f_grow2 = jax.jit(jax.vmap(
            lambda p, n, si, sv: planar_batched.grow_planar_regions_batched(
                p, n, labels0, si, sv, cfg.planar, 0).labels))
        lab = f_grow2(batch_pts(0), nrm, ranked.indices, ranked.valid)
        f_clu = jax.jit(jax.vmap(
            lambda p, l: cluster.segment_clusters(
                p, l, seed_vec, cfg.cluster, 0)))
        timeit("cluster", f_clu, lambda i: (batch_pts(i), lab))

    if "full" in stages:
        f_full = jax.jit(jax.vmap(lambda p: seg._forward_impl(p, origin)[0]))
        timeit("full", f_full, lambda i: (batch_pts(i),))


if __name__ == "__main__":
    main()
