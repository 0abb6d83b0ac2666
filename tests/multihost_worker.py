"""Worker for tests/test_multihost.py: one process of a 2-process CPU job.

Runs the column-sharded segmentation step over a mesh that SPANS processes
(4 local CPU devices x 2 processes = 8), then process 0 dumps the
replicated outputs for the parent to compare against the single-process
8-device run of the identical program.

Usage: python tests/multihost_worker.py <process_id> <port> <out.npz>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]

import re

flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from pcseg_tpu.parallel import distributed  # noqa: E402

ok = distributed.initialize(f"localhost:{port}", 2, pid)
assert ok and jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from pcseg_tpu.parallel import sharded  # noqa: E402
from pcseg_tpu.utils.synthetic import synthetic_room_cloud  # noqa: E402

H, W = 48, 64
pts, origin = synthetic_room_cloud(H, W, f=float(H), seed=2)

mesh = distributed.make_global_mesh()
assert mesh.devices.size == 8

# this process owns the pid-th half of the columns (device-id order)
w_proc = W // 2
local = np.ascontiguousarray(pts[:, pid * w_proc:(pid + 1) * w_proc])
pts_g = distributed.host_local_to_global(mesh, P(None, "space", None), local)

step = sharded.build_sharded_segment_step(mesh)
out = step(pts_g, jnp.asarray(origin))

labels = distributed.global_to_host_replicated(out.labels)
planes = distributed.global_to_host_replicated(out.planar.planes)
num_regions = int(distributed.global_to_host_replicated(
    out.planar.num_regions))
num_clusters = int(distributed.global_to_host_replicated(out.num_clusters))

if pid == 0:
    np.savez(out_path, labels=labels, planes=planes,
             num_regions=num_regions, num_clusters=num_clusters)
    print("multihost worker 0: wrote", out_path, flush=True)
