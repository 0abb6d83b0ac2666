#!/usr/bin/env python
"""Decompose the relay ingest cost (the dominant stream-path term).

Measures, for the production [B, H, W] u16 payload:
  1. H2D alone (jnp.asarray + block_until_ready)
  2. dispatch-only on pre-placed inputs (fixed per-dispatch cost)
  3. roundtrip with scalar D2H at several batch sizes (fixed vs linear)
  4. overlap: dispatch depth-2 pipelining vs serial forcing
Writes benchmarks/ingest_probe.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pcseg_jax_cache")

H, W = 480, 640
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ingest_probe.json")


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    t0 = time.time()
    _ = float(jnp.ones((8, 8)).sum())
    print(f"claimed in {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    results = {}

    def flush():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    def mk(b, i):
        return (rng.integers(0, 60000, (b, H, W)).astype(np.uint16)
                + np.uint16(i % 3))

    # 1. H2D alone
    for b in (1, 8, 32):
        times = []
        for i in range(5):
            x = mk(b, i)
            t1 = time.perf_counter()
            d = jnp.asarray(x)
            d.block_until_ready()
            times.append(time.perf_counter() - t1)
        mb = b * H * W * 2 / 1e6
        results[f"h2d_b{b}_ms"] = round(min(times) * 1e3, 1)
        results[f"h2d_b{b}_MBps"] = round(mb / min(times) / 1e3 * 1e3, 1)
        print(f"h2d b={b}: {min(times)*1e3:.1f} ms "
              f"({mb/min(times):.1f} MB/s) all="
              + " ".join(f"{t*1e3:.0f}" for t in times), flush=True)
    flush()

    # 2. dispatch-only: trivial jit on pre-placed input, scalar out
    f_triv = jax.jit(lambda d, s: jnp.sum(d // jnp.uint16(7)) + s)
    pre = [jnp.asarray(mk(8, i)) for i in range(6)]
    for p in pre:
        p.block_until_ready()
    _ = np.asarray(f_triv(pre[0], jnp.uint32(0)))
    times = []
    for i in range(5):
        t1 = time.perf_counter()
        out = f_triv(pre[i + 1], jnp.uint32(i))
        _ = np.asarray(out)
        times.append(time.perf_counter() - t1)
    results["dispatch_scalar_ms"] = round(min(times) * 1e3, 1)
    print(f"dispatch-only scalar: {min(times)*1e3:.1f} ms all="
          + " ".join(f"{t*1e3:.0f}" for t in times), flush=True)
    flush()

    # 3. roundtrip (H2D + trivial + scalar D2H) vs batch
    for b in (1, 8, 16, 32):
        _ = np.asarray(f_triv(jnp.asarray(mk(b, 0)), jnp.uint32(0))) \
            if b == 8 else None
        fb = jax.jit(lambda d, s: jnp.sum(d // jnp.uint16(7)) + s)
        _ = np.asarray(fb(jnp.asarray(mk(b, 0)), jnp.uint32(0)))
        times = []
        for i in range(5):
            x = mk(b, i + 1)
            t1 = time.perf_counter()
            out = fb(jnp.asarray(x), jnp.uint32(i))
            _ = np.asarray(out)
            times.append(time.perf_counter() - t1)
        results[f"roundtrip_b{b}_ms"] = round(min(times) * 1e3, 1)
        results[f"roundtrip_b{b}_ms_frame"] = round(min(times) * 1e3 / b, 2)
        print(f"roundtrip b={b}: {min(times)*1e3:.1f} ms "
              f"({min(times)*1e3/b:.1f} ms/frame) all="
              + " ".join(f"{t*1e3:.0f}" for t in times), flush=True)
    flush()

    # 4. overlap: N batches serial vs depth-2 pipelined (b=8)
    N = 6
    xs = [mk(8, i) for i in range(N + 1)]
    _ = np.asarray(f_triv(jnp.asarray(xs[0]), jnp.uint32(0)))
    t1 = time.perf_counter()
    for i in range(N):
        _ = np.asarray(f_triv(jnp.asarray(xs[i + 1]), jnp.uint32(i)))
    serial = time.perf_counter() - t1
    t1 = time.perf_counter()
    pend = []
    for i in range(N):
        pend.append(f_triv(jnp.asarray(xs[i + 1]), jnp.uint32(100 + i)))
        if len(pend) > 2:
            _ = np.asarray(pend.pop(0))
    for p in pend:
        _ = np.asarray(p)
    piped = time.perf_counter() - t1
    results["serial_6x_ms"] = round(serial * 1e3, 1)
    results["piped_6x_ms"] = round(piped * 1e3, 1)
    results["overlap_speedup"] = round(serial / piped, 2)
    print(f"serial {serial*1e3:.0f} ms vs piped {piped*1e3:.0f} ms "
          f"(x{serial/piped:.2f})", flush=True)
    flush()


if __name__ == "__main__":
    main()
