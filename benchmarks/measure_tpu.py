#!/usr/bin/env python
"""Stage-by-stage TPU measurement harness (run with the chip free).

Methodology notes (this environment):
  * the relay result-caches identical computations — every timed iteration
    perturbs the input;
  * async dispatch can make block_until_ready lie — every iteration forces
    a host transfer of a result leaf;
  * first call includes remote compile (minutes for the big programs).

Writes benchmarks/tpu_results.json and prints a summary table.
"""

import json
import os
import time

import numpy as np

H, W = 480, 640
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_results.json")


def probe(timeout_s=60):
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    _ = float(jnp.ones((64, 64)).sum())
    return time.perf_counter() - t0


def bench(fn, make_args, iters=5, sync=lambda out: np.asarray(out[0])):
    out = fn(*make_args(0))
    sync(out)
    times = []
    for i in range(1, iters + 1):
        args = make_args(i)
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append(time.perf_counter() - t0)
    return min(times), times


def main():
    import jax
    import jax.numpy as jnp
    from pcseg_tpu.models import pipeline, cluster, unorganized
    from pcseg_tpu.models.config import (
        UNLABELED, ClusterRegionConfig)
    from pcseg_tpu.ops import normals as normals_op
    from pcseg_tpu.ops import seeds as seeds_op
    from pcseg_tpu.utils.synthetic import synthetic_room_cloud

    print("probe:", probe(), "s;", jax.devices())
    results = {}

    pts_np, origin_np = synthetic_room_cloud(H, W, f=float(H), seed=1)
    origin = jnp.asarray(origin_np)

    def var(i):
        return jnp.asarray(pts_np + np.float32(i * 1e-5))

    # stages
    f_norm = jax.jit(lambda p, o: normals_op.compute_normals_organized(p, o))
    best, _ = bench(lambda p: f_norm(p, origin), lambda i: (var(i),),
                    sync=lambda o: np.asarray(o))
    results["normals_ms"] = best * 1e3

    nrm0 = f_norm(var(0), origin)
    f_seeds = jax.jit(lambda p, n: seeds_op.seeds_from_plane_support(p, n))
    best, _ = bench(lambda p: f_seeds(p, nrm0), lambda i: (var(i),),
                    sync=lambda o: np.asarray(o.indices))
    results["seeds_ms"] = best * 1e3

    seg = pipeline.Segmenter()
    best, _ = bench(lambda p: seg.device_forward(p, origin),
                    lambda i: (var(i),))
    results["forward_ms"] = best * 1e3
    results["points_per_sec"] = H * W / best

    # full frame incl. host finalize
    def full(p):
        return seg.segment_frame(np.asarray(p), origin_np)
    t0 = time.perf_counter()
    r = full(var(97))
    results["segment_frame_ms"] = (time.perf_counter() - t0) * 1e3
    results["num_planar"] = r.metrics.num_planar_regions
    results["num_clusters"] = r.metrics.num_clusters

    # unorganized 1M points
    rng = np.random.default_rng(0)
    big = np.concatenate([
        c + rng.normal(0, 0.4, (250_000, 3)).astype(np.float32)
        for c in np.array([[0, 0, 0], [30, 0, 0], [0, 35, 0], [40, 40, 0]],
                          np.float32)])
    f_unorg = jax.jit(lambda p: unorganized.cluster_unorganized(
        p, ClusterRegionConfig(min_region_inliers=1000),
        cell_size=0.5, grid_shape=(256, 256)))
    best, _ = bench(lambda p: f_unorg(p),
                    lambda i: (jnp.asarray(big + np.float32(i * 1e-5)),),
                    iters=3, sync=lambda o: np.asarray(o.num_regions))
    results["unorganized_1m_ms"] = best * 1e3
    results["unorganized_points_per_sec"] = len(big) / best

    # batched streaming (8 frames)
    batch = jnp.asarray(np.stack([pts_np + np.float32(i * 1e-4)
                                  for i in range(8)]))
    origins = jnp.zeros((8, 3))
    best, _ = bench(
        lambda b: seg.device_forward_batched(b, origins),
        lambda i: (batch + np.float32(i * 1e-5),), iters=3)
    results["batched8_ms"] = best * 1e3
    results["batched8_points_per_sec"] = 8 * H * W / best

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    for k, v in results.items():
        print(f"{k}: {v:.2f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
