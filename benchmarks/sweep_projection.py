#!/usr/bin/env python
"""Projected multi-host sweep throughput (BASELINE config 5).

No multi-chip hardware exists in this environment (one relay-attached
chip), so the 10M-point sweep number is a PROJECTION assembled from
measured parts, with the model stated explicitly:

  1. R1: measured single-chip streaming rate (BENCH artifact or --rate).
  2. Sharding work overhead, measured on the virtual 8-device CPU mesh as
     STRONG scaling on a fixed grid: t(sharded over n virtual devices) /
     t(single device), same [H, W] problem, same physical cores. Virtual
     CPU devices add no compute, so this ratio isolates the extra work the
     sharded program performs — replicated slot updates, halo recompute,
     result all-gathers — which on a real pod is the per-chip efficiency
     loss. (Weak scaling on a virtual mesh would be meaningless: n
     programs time-share one CPU, eff ~ 1/n by construction.)
  3. Analytic collective traffic per frame vs ICI (~1e11 B/s, ~1 us/hop):
     halo rings, moment psums, label gathers — microseconds against
     multi-ms frames, so the wire itself is never the limiter at VGA.

Projection: R(n) = R1 * n / overhead(n); sweep_seconds = 10e6 / R(n).
Writes benchmarks/sweep_projection.json.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
       XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/sweep_projection.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benchmarks", "sweep_projection.json")


def measured_single_chip_rate() -> float:
    """Latest committed TPU streaming rate (points/s)."""
    ext = os.path.join(ROOT, "benchmarks", "bench_extended.json")
    try:
        with open(ext) as f:
            return float(json.load(f)["stream_points_per_sec"])
    except Exception:
        return float("nan")


def time_fn(fn, *args, iters=3):
    fn(*args)  # compile
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(
            lambda x: getattr(x, "block_until_ready", lambda: x)(), out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=None,
                    help="single-chip points/s (default: bench artifact)")
    # 192x256 shards to W_local=32 at n=8 — the narrowest slice that is
    # representative of the actual config-5 deployment (VGA frames shard
    # to W_local=80): at the old 96x128 default, W_local=16 makes the
    # normals halo (+-max_scan_steps=16 columns) a 3x duplication by
    # construction and the measured overhead says more about the harness
    # than the design. Both grids are recorded in the artifact.
    ap.add_argument("--h", type=int, default=192)
    ap.add_argument("--w", type=int, default=256)
    args = ap.parse_args()

    global jax
    import jax
    import jax.numpy as jnp
    from pcseg_tpu.parallel import sharded
    from pcseg_tpu.models import pipeline
    from pcseg_tpu.utils.synthetic import synthetic_room_cloud

    h, w = args.h, args.w
    rate1 = args.rate or measured_single_chip_rate()

    pts, origin = synthetic_room_cloud(h, w, f=float(h), seed=2)
    pts_j, origin_j = jnp.asarray(pts), jnp.asarray(origin)

    seg = pipeline.Segmenter(pipeline.SegmenterConfig())
    t_single = time_fn(lambda p, o: seg.device_forward(p, o),
                       pts_j, origin_j)

    overheads = {}
    for n in (2, 4, 8):
        if len(jax.devices()) < n or w % n:
            continue
        mesh = sharded.make_mesh(n)
        step = sharded.build_sharded_segment_step(mesh)
        t_n = time_fn(step, pts_j, origin_j)
        overheads[n] = t_n / t_single

    # analytic per-frame collective traffic per shard boundary (f32)
    cfg = pipeline.SegmenterConfig()
    k = cfg.planar.max_regions
    scan = cfg.normals.max_scan_steps
    ici_bw = 1e11          # B/s per link (pod-slice class)
    ici_lat = 1e-6         # s per hop
    halo_bytes = 4 * h * 3 * scan * 2
    moment_bytes = 4 * k * 10
    # flood/epoch loops exchange 1-column halos each round; bound rounds
    collective_s = (halo_bytes + moment_bytes) / ici_bw + 200 * ici_lat

    proj = {}
    for n, ov in overheads.items():
        rn = rate1 * n / max(ov, 1.0)
        proj[str(n)] = {
            "sharded_work_overhead_cpu_mesh": round(ov, 3),
            "projected_points_per_sec": None if rate1 != rate1
            else round(rn, 1),
            "projected_10M_sweep_seconds": None if rate1 != rate1
            else round(10e6 / rn, 3),
        }

    result = {
        "model": "R(n) = R1 * n / overhead(n); overhead = strong-scaling "
                 "work ratio on the virtual 8-dev CPU mesh (same grid, "
                 "same cores => isolates duplicated/replicated work); "
                 "ICI wire time analytic and negligible at VGA. Grid "
                 "192x256 shards to W_local=32 at n=8 (the config-5 "
                 "deployment shards VGA to W_local=80; narrower harness "
                 "shards overstate halo duplication by construction).",
        "single_chip_points_per_sec": rate1 if rate1 == rate1 else None,
        "grid": [h, w],
        "single_device_seconds_cpu": round(t_single, 4),
        "analytic_collective_seconds_per_frame": collective_s,
        "projection": proj,
    }
    # keep prior grids' projections side by side (artifact records both
    # the legacy 96x128 harness and the representative default)
    prior = {}
    try:
        with open(OUT) as f:
            prior = json.load(f).get("by_grid", {})
    except Exception:
        pass
    prior[f"{h}x{w}"] = {"single_device_seconds_cpu": round(t_single, 4),
                         "projection": proj}
    result["by_grid"] = prior
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
