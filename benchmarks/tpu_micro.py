import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp, dataclasses
from pcseg_tpu.models import cluster, planar_batched, pipeline
from pcseg_tpu.models.config import UNLABELED, ClusterRegionConfig, PlanarRegionConfig
from pcseg_tpu.ops import connectivity, seeds as seeds_op, normals as normals_op
from pcseg_tpu.utils.synthetic import synthetic_room_cloud

h, w, B = 480, 640, 8
pts_np, origin_np = synthetic_room_cloud(h, w, f=float(h), seed=1)
origin = jnp.asarray(origin_np)
rng = np.random.default_rng(3)
print("backend", jax.devices()[0], flush=True)

def batch_pts(i):
    jit = rng.normal(0, 1e-4, (B,1,1,1)).astype(np.float32)
    a = jnp.asarray(pts_np[None] + jit + np.float32(i*1e-5))
    a.block_until_ready(); return a

def timeit(name, fn, args_fn, iters=3):
    f = jax.jit(fn)
    t0 = time.perf_counter(); r = f(*args_fn(0)); _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    comp = time.perf_counter()-t0
    ts=[]
    for i in range(iters):
        a = args_fn(i+1)
        t0=time.perf_counter(); r=f(*a); _=np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        ts.append(time.perf_counter()-t0)
    print(f"{name:34s} {min(ts)*1e3:7.1f} ms/batch ({min(ts)/B*1e3:7.2f} ms/frame) compile {comp:.0f}s", flush=True)

elig = jnp.asarray(np.isfinite(pts_np).all(-1))
cfg = ClusterRegionConfig()

# CCL alone (pallas path under vmap)
vccl = jax.vmap(lambda p: connectivity.connected_components_scan(
    p, elig, jnp.float32(cfg.squared_distance_threshold), cfg.half_search_window, rounds=24))
timeit("ccl_pallas_vmap", lambda p: jnp.sum(vccl(p)), lambda i: (batch_pts(i),))

# canonical cluster stage
seed_vec = jnp.arange(h*w-1, -1, -1, dtype=jnp.int32)
lab0 = jnp.full((h, w), UNLABELED, jnp.int32)
vclu = jax.vmap(lambda p: cluster.segment_clusters(p, lab0, seed_vec, cfg, 0, canonical_seeds=True).labels)
timeit("cluster_canonical", lambda p: jnp.sum(vclu(p)), lambda i: (batch_pts(i),))

# grow: stage A only vs full
scfg = pipeline.SegmenterConfig()
nrm = jax.jit(jax.vmap(lambda p: normals_op.compute_normals_organized(p, origin, scfg.normals)))(batch_pts(0))
nrm.block_until_ready()
ranked = jax.jit(jax.vmap(lambda p, n: seeds_op.seeds_from_plane_support(p, n)))(batch_pts(0), nrm)
rg = ranked.rank_grid; rg.block_until_ready()

def grow_fn(p, n, r):
    return planar_batched.grow_planar_regions_batched(
        p, n, lab0, jnp.zeros((8,), jnp.int32), jnp.zeros((8,), bool),
        scfg.planar, 0, seed_rank_grid=r).labels
timeit("grow_full", lambda p: jnp.sum(jax.vmap(grow_fn, in_axes=(0,0,0))(p, nrm, rg)), lambda i: (batch_pts(i),))

def grow_a_only(p, n, r):
    return planar_batched.grow_planar_regions_batched(
        p, n, lab0, jnp.zeros((8,), jnp.int32), jnp.zeros((8,), bool),
        scfg.planar, 0, seed_rank_grid=r, closure_epochs=0,
        stage_a_gens=26).labels
# hack: closure_epochs=0 still has box epochs + final; measure with tiny flood_rounds? keep as is
timeit("grow_no_closure", lambda p: jnp.sum(jax.vmap(grow_a_only, in_axes=(0,0,0))(p, nrm, rg)), lambda i: (batch_pts(i),))
