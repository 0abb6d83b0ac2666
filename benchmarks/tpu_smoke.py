#!/usr/bin/env python
"""TPU smoke test: compile + run the DEFAULT streaming path on the real chip.

Runs device_forward_stream (the exact production impl combination: patched
stage A + Pallas epoch megakernel + Pallas flood/CCL, under vmap) on a
2-frame QVGA batch. This is the gate that round 3 lacked: the interpret-mode
equivalence tests cannot catch Mosaic/VMEM lowering failures, and the
round-3 snapshot shipped a streaming path that did not compile on hardware.

Run before EVERY snapshot commit (CLAUDE.md round-end discipline):

    timeout 600 python benchmarks/tpu_smoke.py

Exit 0 = the production path compiles and executes on the chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 240, 320
BATCH = 2


def main():
    import jax
    import jax.numpy as jnp
    from pcseg_tpu.models import pipeline
    from pcseg_tpu.ops import unproject
    from pcseg_tpu.utils.synthetic import synthetic_room_cloud

    dev = jax.devices()[0]
    print(f"smoke: backend {dev.platform} ({dev})", flush=True)
    if dev.platform not in ("tpu", "axon"):
        print("smoke: WARNING not a TPU — Mosaic lowering NOT exercised",
              flush=True)

    pts_np, origin_np = synthetic_room_cloud(H, W, f=float(H), seed=1)
    rays = jnp.asarray(unproject.camera_ray_table(H, W, f=float(H)))
    base_u16 = unproject.encode_range(pts_np)
    frames = np.stack([base_u16, base_u16 + np.uint16(1)])
    frames = np.where(base_u16[None] > 0, frames, 0).astype(np.uint16)

    seg = pipeline.Segmenter(pipeline.SegmenterConfig())
    t0 = time.perf_counter()
    labels_u8, n_planar, n_clusters, planes = seg.device_forward_stream(
        jnp.asarray(frames), rays, jnp.asarray(origin_np),
        unproject.DEFAULT_DEPTH_SCALE)
    labels_np = np.asarray(labels_u8)
    t1 = time.perf_counter()
    print(f"smoke: compile+run {t1 - t0:.1f}s, "
          f"planar={np.asarray(n_planar).tolist()} "
          f"clusters={np.asarray(n_clusters).tolist()} "
          f"labeled_frac={float((labels_np != 255).mean()):.3f}", flush=True)
    assert labels_np.shape == (BATCH, H, W)
    # the synthetic room has a floor + walls: growth must claim most pixels
    assert (labels_np != 255).mean() > 0.5, "almost nothing labeled"
    assert all(n > 0 for n in np.asarray(n_planar).tolist()), \
        "no planar regions found"
    print("smoke: OK", flush=True)


if __name__ == "__main__":
    main()
