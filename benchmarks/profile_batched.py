#!/usr/bin/env python
"""In-context per-stage cost of the PRODUCTION streaming path (batch B).

The single-dispatch stage timings in measure_tpu.py are dominated by the
relay's fixed ~25 ms round trip + payload transfer (CLAUDE.md), so they
cannot localize the stream path's compute. This harness times nested
PREFIXES of the streaming program (unproject; +normals; +seeds; +grow;
+cluster = full) at batch B with a *scalar checksum* output — the D2H is
4 bytes, so consecutive-prefix differences isolate each stage's in-context
compute cost. Inputs are uniquely perturbed per dispatch (the relay
result-caches identical computations).

Writes benchmarks/profile_batched.json. Run with the chip free; ~6
program compiles (~100 s each cold, cached by the persistent cache).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pcseg_jax_cache")

H, W = 480, 640
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "profile_batched.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--radii-factor", default=None)
    args = ap.parse_args()
    if args.radii_factor:
        os.environ["PCSEG_RADII_FACTOR"] = args.radii_factor

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:  # noqa: BLE001
        print("compilation cache unavailable:", e)

    from pcseg_tpu.models import cluster, pipeline
    from pcseg_tpu.models import planar_batched
    from pcseg_tpu.models.config import UNLABELED
    from pcseg_tpu.ops import nansafe
    from pcseg_tpu.ops import normals as normals_op
    from pcseg_tpu.ops import seeds as seeds_op
    from pcseg_tpu.ops import unproject
    from pcseg_tpu.utils.synthetic import synthetic_room_cloud

    t0 = time.time()
    _ = float(jnp.ones((8, 8)).sum())
    print(f"claimed in {time.time() - t0:.1f}s; {jax.devices()}", flush=True)

    B = args.batch
    seg_cfg = pipeline.SegmenterConfig()
    pts_np, origin_np = synthetic_room_cloud(H, W, f=float(H), seed=1)
    origin = jnp.asarray(origin_np)
    rays = jnp.asarray(unproject.camera_ray_table(H, W, f=float(H)))
    base_u16 = unproject.encode_range(pts_np)
    valid = base_u16 > 0
    rng = np.random.default_rng(7)

    def mk(i):
        jit16 = rng.integers(0, 5, size=(B, H, W), dtype=np.uint16)
        fr = np.where(valid[None], base_u16[None] + jit16, 0)
        return (jnp.asarray(fr.astype(np.uint16)),)

    def stage_points(d):
        return unproject.unproject_range(d, rays,
                                         unproject.DEFAULT_DEPTH_SCALE)

    def stage_normals(d):
        p = stage_points(d)
        return p, normals_op.compute_normals_organized(
            p, origin, seg_cfg.normals)

    def stage_seeds(d):
        p, n = stage_normals(d)
        ranked = seeds_op.seeds_from_plane_support(
            p, n, seg_cfg.plane_support_seeds)
        return p, n, ranked

    def stage_grow(d):
        p, n, ranked = stage_seeds(d)
        labels0 = jnp.full((H, W), UNLABELED, jnp.int32)
        dev = planar_batched.grow_planar_regions_batched(
            p, n, labels0, ranked.indices, ranked.valid, seg_cfg.planar, 0,
            seed_rank_grid=ranked.rank_grid)
        return p, dev

    def stage_full(d):
        p, dev = stage_grow(d)
        hw = H * W
        seed_vec = jnp.arange(hw - 1, -1, -1, dtype=jnp.int32)
        cres = cluster.segment_clusters(
            p, dev.labels, seed_vec, seg_cfg.cluster, 0,
            canonical_seeds=True)
        final = jnp.where(
            (cres.labels >= 0) & (dev.labels == UNLABELED),
            cres.labels + dev.num_regions, cres.labels)
        return final

    def csum(x):
        return jnp.sum(nansafe.sanitize(x.astype(jnp.float32)))

    programs = {
        "unproject": lambda d: csum(stage_points(d)),
        "normals": lambda d: csum(stage_normals(d)[1]),
        "seeds": lambda d: csum(
            stage_seeds(d)[2].rank_grid.astype(jnp.float32)),
        "grow": lambda d: csum(stage_grow(d)[1].labels.astype(jnp.float32)),
        "full": lambda d: csum(stage_full(d).astype(jnp.float32)),
    }

    results = {"hw": [H, W], "batch": B,
               "radii_factor": os.environ.get("PCSEG_RADII_FACTOR", "6/5")}

    def flush():
        with open(OUT + ".tmp", "w") as f:
            json.dump(results, f, indent=2)
        os.replace(OUT + ".tmp", OUT)

    prev_ms = 0.0
    for name, fn in programs.items():
        f = jax.jit(jax.vmap(fn))
        t1 = time.time()
        out = f(*mk(0))
        _ = np.asarray(out)
        comp = time.time() - t1
        times = []
        for i in range(args.iters):
            a = mk(i + 1)
            t1 = time.perf_counter()
            out = f(*a)
            _ = np.asarray(out)
            times.append(time.perf_counter() - t1)
        best_ms = min(times) * 1e3
        results[name] = {
            "ms_batch": round(best_ms, 2),
            "ms_frame": round(best_ms / B, 2),
            "ms_frame_delta": round((best_ms - prev_ms) / B, 2),
            "compile_s": round(comp, 1),
        }
        print(f"{name:10s} {best_ms:8.1f} ms/batch "
              f"{best_ms / B:7.2f} ms/frame "
              f"delta {(best_ms - prev_ms) / B:7.2f} ms/frame "
              f"(compile {comp:.0f}s)", flush=True)
        prev_ms = best_ms
        flush()

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
