#!/usr/bin/env python
"""Stage-by-stage TPU measurement harness (run with the chip free).

Methodology notes (this environment):
  * the relay result-caches identical computations — every timed iteration
    perturbs the input;
  * async dispatch can make block_until_ready lie — every iteration forces
    a host transfer of a result leaf;
  * first call includes remote compile (minutes for the big programs) —
    the persistent compilation cache is enabled to amortize across runs;
  * ONE process does everything (the chip claim costs ~166 s cold and two
    concurrent TPU processes are forbidden, CLAUDE.md).

Every section is independently fault-isolated and the results file is
rewritten after each one, so an interruption still leaves a breakdown.
Writes benchmarks/tpu_results.json and prints a summary table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 480, 640
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_results.json")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pcseg_jax_cache")

results = {}


def flush():
    with open(OUT + ".tmp", "w") as f:
        json.dump(results, f, indent=2)
    os.replace(OUT + ".tmp", OUT)


def section(name):
    """Decorator: run the section, record wall/fault, flush results."""
    def deco(fn):
        t0 = time.time()
        try:
            fn()
            print(f"[section {name}: ok in {time.time() - t0:.1f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - keep measuring
            import traceback
            traceback.print_exc()
            results[f"{name}_error"] = repr(e)
            print(f"[section {name}: FAILED in {time.time() - t0:.1f}s]",
                  flush=True)
        flush()
    return deco


def bench(fn, make_args, iters=5, sync=None):
    """min/median wall seconds of fn(*make_args(i)) incl. a forced D2H."""
    if sync is None:
        def sync(out):
            leaves = [x for x in jax.tree_util.tree_leaves(out)
                      if hasattr(x, "shape")]
            _ = np.asarray(leaves[0])
            for leaf in leaves[1:]:
                leaf.block_until_ready()
    t0 = time.time()
    out = fn(*make_args(0))
    sync(out)
    compile_s = time.time() - t0
    times = []
    for i in range(1, iters + 1):
        args = make_args(i)
        t1 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append(time.perf_counter() - t1)
    return min(times), times, compile_s


def main():
    global jax
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:  # noqa: BLE001
        print("compilation cache unavailable:", e)

    from pcseg_tpu.models import pipeline, cluster, unorganized
    from pcseg_tpu.models import planar_batched
    from pcseg_tpu.models.config import (
        UNLABELED, ClusterRegionConfig)
    from pcseg_tpu.ops import normals as normals_op
    from pcseg_tpu.ops import seeds as seeds_op
    from pcseg_tpu.ops import unproject
    from pcseg_tpu.utils.synthetic import synthetic_room_cloud

    _ = float(jnp.ones((64, 64)).sum())
    results["claim_s"] = round(time.time() - t0, 1)
    results["device"] = str(jax.devices()[0])
    print(f"claimed in {results['claim_s']}s; {jax.devices()}", flush=True)
    flush()

    pts_np, origin_np = synthetic_room_cloud(H, W, f=float(H), seed=1)
    origin = jnp.asarray(origin_np)
    seg = pipeline.Segmenter()
    cfg = seg.config

    def var(i):
        return jnp.asarray(pts_np + np.float32(i * 1e-5))

    # ---- transfer floor: H2D of a u16 batch + trivial op + D2H of u8 ----
    @section("transfers")
    def _():
        batch = 8
        base_u16 = unproject.encode_range(pts_np)
        rng = np.random.default_rng(3)

        f_triv = jax.jit(lambda d: (d.astype(jnp.uint8) ^ jnp.uint8(1)))
        def mk(i):
            arr = base_u16[None] + rng.integers(
                0, 5, (batch, H, W)).astype(np.uint16)
            return (jnp.asarray(arr),)
        best, times, _c = bench(f_triv, mk, iters=5,
                                sync=lambda o: np.asarray(o))
        results["transfer_roundtrip_b8_ms"] = round(best * 1e3, 2)
        results["transfer_roundtrip_b8_all_ms"] = [round(t * 1e3, 1)
                                                   for t in times]

    # ---- stage isolation on one frame ----
    @section("normals")
    def _():
        f = jax.jit(lambda p: normals_op.compute_normals_organized(
            p, origin, cfg.normals))
        best, times, comp = bench(f, lambda i: (var(i),),
                                  sync=lambda o: np.asarray(o))
        results["normals_ms"] = round(best * 1e3, 2)
        results["normals_compile_s"] = round(comp, 1)

    f_norm = jax.jit(lambda p: normals_op.compute_normals_organized(
        p, origin, cfg.normals))
    nrm0 = f_norm(var(0))

    @section("seeds")
    def _():
        f = jax.jit(lambda p, n: seeds_op.seeds_from_plane_support(
            p, n, cfg.plane_support_seeds).rank_grid)
        best, times, comp = bench(f, lambda i: (var(i), nrm0),
                                  sync=lambda o: np.asarray(o))
        results["seeds_rankgrid_ms"] = round(best * 1e3, 2)
        results["seeds_compile_s"] = round(comp, 1)

    f_seeds = jax.jit(lambda p, n: seeds_op.seeds_from_plane_support(
        p, n, cfg.plane_support_seeds))
    ranked0 = f_seeds(var(0), nrm0)
    labels0 = jnp.full((H, W), UNLABELED, jnp.int32)

    @section("grow")
    def _():
        f = jax.jit(lambda p, n, rg: planar_batched
                    .grow_planar_regions_batched(
                        p, n, labels0, ranked0.indices, ranked0.valid,
                        cfg.planar, 0, seed_rank_grid=rg))
        best, times, comp = bench(
            f, lambda i: (var(i), nrm0, ranked0.rank_grid),
            sync=lambda o: np.asarray(o.labels))
        results["grow_ms"] = round(best * 1e3, 2)
        results["grow_compile_s"] = round(comp, 1)

    @section("cluster")
    def _():
        f_g = jax.jit(lambda p, n, rg: planar_batched
                      .grow_planar_regions_batched(
                          p, n, labels0, ranked0.indices, ranked0.valid,
                          cfg.planar, 0, seed_rank_grid=rg))
        dev0 = f_g(var(0), nrm0, ranked0.rank_grid)
        seed_vec = jnp.arange(H * W - 1, -1, -1, dtype=jnp.int32)
        f = jax.jit(lambda p, lab: cluster.segment_clusters(
            p, lab, seed_vec, cfg.cluster, 0, canonical_seeds=True))
        best, times, comp = bench(
            f, lambda i: (var(i), dev0.labels),
            sync=lambda o: np.asarray(o.labels))
        results["cluster_ms"] = round(best * 1e3, 2)
        results["cluster_compile_s"] = round(comp, 1)

    @section("unproject_stage")
    def _():
        rays = jnp.asarray(unproject.camera_ray_table(H, W, f=float(H)))
        base_u16 = unproject.encode_range(pts_np)
        f = jax.jit(lambda d: unproject.unproject_range(
            d, rays, unproject.DEFAULT_DEPTH_SCALE))
        rng = np.random.default_rng(5)
        def mk(i):
            return (jnp.asarray(base_u16 + rng.integers(
                0, 5, (H, W)).astype(np.uint16)),)
        best, times, comp = bench(f, mk, iters=4,
                                  sync=lambda o: np.asarray(o[0, :4]))
        results["unproject_ms"] = round(best * 1e3, 2)

    # ---- single-frame full forward ----
    @section("forward_single")
    def _():
        best, times, comp = bench(
            lambda p: seg.device_forward(p, origin), lambda i: (var(i),),
            sync=lambda o: np.asarray(o[0]))
        results["forward_ms"] = round(best * 1e3, 2)
        results["forward_compile_s"] = round(comp, 1)
        results["forward_points_per_sec"] = round(H * W / best, 1)

    # ---- streaming batch: default schedule, then 4/3 ----
    def stream_bench(tag, radii_factor=None, batch=8):
        if radii_factor is not None:
            os.environ["PCSEG_RADII_FACTOR"] = radii_factor
        try:
            s = pipeline.Segmenter()  # fresh trace reads the env knob
            rays = jnp.asarray(unproject.camera_ray_table(H, W, f=float(H)))
            base_u16 = unproject.encode_range(pts_np)
            valid = base_u16 > 0
            rng = np.random.default_rng(7)

            def mk(i):
                jit16 = rng.integers(0, 5, size=(batch, H, W),
                                     dtype=np.uint16)
                fr = np.where(valid[None], base_u16[None] + jit16,
                              0).astype(np.uint16)
                return (jnp.asarray(fr),)

            f = lambda d: s.device_forward_stream(  # noqa: E731
                d, rays, origin, unproject.DEFAULT_DEPTH_SCALE)
            best, times, comp = bench(f, mk, iters=5,
                                      sync=lambda o: np.asarray(o[0]))
            results[f"stream_{tag}_ms_frame"] = round(best * 1e3 / batch, 2)
            results[f"stream_{tag}_pts_per_sec"] = round(
                batch * H * W / best, 1)
            results[f"stream_{tag}_compile_s"] = round(comp, 1)
        finally:
            if radii_factor is not None:
                os.environ.pop("PCSEG_RADII_FACTOR", None)

    @section("stream_default")
    def _():
        stream_bench("default")

    @section("stream_43")
    def _():
        stream_bench("fac43", radii_factor="4/3")

    # ---- full pipeline incl. host finalize ----
    @section("segment_frame")
    def _():
        times = []
        for i in range(3):
            p = pts_np + np.float32((i + 1) * 1e-5)
            t1 = time.perf_counter()
            r = seg.segment_frame(p, origin_np)
            times.append(time.perf_counter() - t1)
        results["segment_frame_ms"] = round(min(times) * 1e3, 1)
        results["segment_frame_all_ms"] = [round(t * 1e3) for t in times]
        results["num_planar"] = r.metrics.num_planar_regions
        results["num_clusters"] = r.metrics.num_clusters

    # ---- config 3: 1M-point unorganized clustering + mean shift ----
    rng = np.random.default_rng(0)
    big = np.concatenate([
        c + rng.normal(0, 0.4, (250_000, 3)).astype(np.float32)
        for c in np.array([[0, 0, 0], [30, 0, 0], [0, 35, 0], [40, 40, 0]],
                          np.float32)])

    @section("unorganized_1m")
    def _():
        f = jax.jit(lambda p: unorganized.cluster_unorganized(
            p, ClusterRegionConfig(min_region_inliers=1000),
            cell_size=0.5, grid_shape=(256, 256)))
        best, times, comp = bench(
            f, lambda i: (jnp.asarray(big + np.float32(i * 1e-5)),),
            iters=3, sync=lambda o: np.asarray(o.num_regions))
        results["unorganized_1m_ms"] = round(best * 1e3, 2)
        results["unorganized_1m_points_per_sec"] = round(len(big) / best, 1)
        results["unorganized_compile_s"] = round(comp, 1)

    @section("mean_shift_1m")
    def _():
        times = []
        nreg = 0
        for i in range(3):
            p = big + np.float32(i * 1e-5)
            t1 = time.perf_counter()
            # min_region_inliers gates GRID CELLS in the mean-shift path
            # (the r5-first-run config of 1000 rejected every mode), and
            # the cell size must keep the reference's >=50-support gate
            # satisfiable: at 0.5 m cells the 1 m window holds <= 25
            # cells, so every mode died; 0.125 m cells give ~121.
            r = unorganized.cluster_unorganized_mean_shift(
                p, ClusterRegionConfig(),
                cell_size=0.125, grid_shape=(512, 512), iterations=5)
            nreg = int(np.asarray(r.num_regions))
            times.append(time.perf_counter() - t1)
        results["mean_shift_1m_ms"] = round(min(times) * 1e3, 1)
        results["mean_shift_1m_points_per_sec"] = round(
            len(big) / min(times), 1)
        results["mean_shift_1m_regions"] = nreg

    # ---- batched full forward (no unproject; f32 ingest) ----
    @section("batched8_f32")
    def _():
        batch = jnp.asarray(np.stack([pts_np + np.float32(i * 1e-4)
                                      for i in range(8)]))
        origins = jnp.zeros((8, 3))
        best, times, comp = bench(
            lambda b: seg.device_forward_batched(b, origins),
            lambda i: (batch + np.float32(i * 1e-5),), iters=3,
            sync=lambda o: np.asarray(o[0]))
        results["batched8_f32_ms_frame"] = round(best * 1e3 / 8, 2)
        results["batched8_f32_points_per_sec"] = round(8 * H * W / best, 1)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
