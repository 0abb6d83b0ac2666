#!/usr/bin/env python
"""Per-stage wall-clock breakdown of the device forward on the real chip.

Times each pipeline stage as its own jitted program (normals, seed ranking,
batched planar growth, cluster closure, full forward) with perturbed inputs
and a forced host transfer per iteration (the relay result-caches identical
computations; see CLAUDE.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from pcseg_tpu.models import cluster, pipeline
from pcseg_tpu.models import planar_batched
from pcseg_tpu.models.config import UNLABELED
from pcseg_tpu.ops import normals as normals_op
from pcseg_tpu.ops import seeds as seeds_op


def timeit(name, fn, inputs, iters=3):
    """fn(i) builds perturbed inputs; returns device arrays to transfer."""
    out = fn(*inputs(0))
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
    times = []
    for i in range(iters):
        args = inputs(i + 1)
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "shape")]
        _ = np.asarray(leaves[0])
        for leaf in leaves[1:]:
            leaf.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name:28s} {best * 1e3:9.2f} ms   (all: "
          + " ".join(f"{t * 1e3:.1f}" for t in times) + ")")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=str, default="480x640")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    h, w = (int(x) for x in args.hw.split("x"))

    from pcseg_tpu.utils.synthetic import synthetic_room_cloud
    points_np, origin_np = synthetic_room_cloud(h, w, f=float(h), seed=1)
    origin = jnp.asarray(origin_np)

    seg = pipeline.Segmenter(pipeline.SegmenterConfig())
    cfg = seg.config

    def pts(i):
        return jnp.asarray(points_np + np.float32(i * 1e-5))

    print(f"grid {h}x{w}, backend {jax.devices()[0]}")

    # Stage 1: normals
    f_norm = jax.jit(lambda p: normals_op.compute_normals_organized(
        p, origin, cfg.normals))
    timeit("normals", f_norm, lambda i: (pts(i),), args.iters)

    nrm = f_norm(pts(0))

    # Stage 2: seed ranking
    f_seeds = jax.jit(lambda p, n: seeds_op.seeds_from_plane_support(
        p, n, cfg.plane_support_seeds))
    timeit("seeds(plane_support)", f_seeds,
           lambda i: (pts(i), nrm), args.iters)

    ranked = f_seeds(pts(0), nrm)

    # Stage 3: batched planar growth
    labels0 = jnp.full((h, w), UNLABELED, jnp.int32)

    f_grow = jax.jit(lambda p, n, si, sv: planar_batched
                     .grow_planar_regions_batched(
                         p, n, labels0, si, sv, cfg.planar, 0))
    timeit("planar_batched", f_grow,
           lambda i: (pts(i), nrm, ranked.indices, ranked.valid), args.iters)

    dev = f_grow(pts(0), nrm, ranked.indices, ranked.valid)

    # Stage 4: cluster closure
    hw_n = h * w
    seed_vec = jnp.arange(hw_n - 1, -1, -1, dtype=jnp.int32)
    f_clu = jax.jit(lambda p, lab: cluster.segment_clusters(
        p, lab, seed_vec, cfg.cluster, 0))
    timeit("cluster", f_clu, lambda i: (pts(i), dev.labels), args.iters)

    # Full forward
    timeit("FULL forward", seg.device_forward,
           lambda i: (pts(i), origin), args.iters)


if __name__ == "__main__":
    main()
