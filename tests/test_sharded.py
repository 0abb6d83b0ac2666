"""Sharded pipeline on a virtual 8-device CPU mesh vs single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcseg_tpu.models.config import (
    UNLABELED, ClusterRegionConfig, ComputeNormalsParams,
    PlanarRegionConfig, SeedsFromPlaneSupportParams)
from pcseg_tpu.models import cluster as cluster_model
from pcseg_tpu.models import planar as planar_model
from pcseg_tpu.ops import connectivity, normals as normals_op
from pcseg_tpu.ops import seeds as seeds_op
from pcseg_tpu.parallel import sharded
from tests import fixtures


NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= NDEV
    return sharded.make_mesh(NDEV)


def room(h=48, w=64):
    pts, origin = fixtures.synthetic_room_cloud(h, w, f=float(h), seed=9)
    return pts, origin


class TestShardedNormals:
    def test_matches_single_device(self, mesh):
        pts, origin = room()
        params = ComputeNormalsParams(max_scan_steps=8)  # halo <= W/8
        single = np.asarray(normals_op.compute_normals_organized(
            jnp.asarray(pts), jnp.asarray(origin), params))

        fn = jax.jit(jax.shard_map(
            lambda p, o: sharded.sharded_normals(p, o, params, "space"),
            mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec(None, "space", None),
                      jax.sharding.PartitionSpec()),
            out_specs=jax.sharding.PartitionSpec(None, "space", None),
            check_vma=False))
        multi = np.asarray(fn(jnp.asarray(pts), jnp.asarray(origin)))

        both = np.isfinite(single) & np.isfinite(multi)
        assert (np.isfinite(single) == np.isfinite(multi)).all()
        # f32 fusion differences on padded shapes reassociate the moment
        # sums; the reference's own tolerance for this is 1e-4
        # (plane_estimator_test.cc:34-36).
        np.testing.assert_allclose(single[both], multi[both], atol=2e-4)


class TestShardedStep:
    def test_full_step_runs_and_matches(self, mesh):
        pts, origin = room()
        normals_params = ComputeNormalsParams(max_scan_steps=8)
        # max_seeds >= qualifying count on this scene: the sharded step now
        # consumes the dense (uncapped) rank grid, so the single-device
        # comparison's seed vector must not truncate
        seed_params = SeedsFromPlaneSupportParams(max_seeds=4096)
        planar_cfg = PlanarRegionConfig(max_regions=16)
        cluster_cfg = ClusterRegionConfig()

        step = sharded.build_sharded_segment_step(
            mesh, normals_params, seed_params, planar_cfg, cluster_cfg,
            max_attempts=32)
        res = step(jnp.asarray(pts), jnp.asarray(origin))
        labels = np.asarray(res.labels)
        assert labels.shape == pts.shape[:2]
        assert int(res.planar.num_regions) >= 1

        # single-device equivalent with the natural (non-transposed) seed
        # orientation the sharded path uses
        nrm = normals_op.compute_normals_organized(
            jnp.asarray(pts), jnp.asarray(origin), normals_params)
        ranked = seeds_op.seeds_from_plane_support(
            jnp.asarray(pts), nrm, seed_params, transposed_parity=False)
        labels0 = jnp.full(pts.shape[:2], UNLABELED, jnp.int32)
        dev = planar_model.grow_planar_regions(
            jnp.asarray(pts), nrm, labels0, ranked.indices, ranked.valid,
            planar_cfg, 0, max_attempts=32)
        assert int(res.planar.num_regions) == int(dev.num_regions)
        agreement = (np.asarray(res.planar.labels)
                     == np.asarray(dev.labels)).mean()
        assert agreement == 1.0, agreement
        np.testing.assert_allclose(
            np.asarray(res.planar.planes)[:int(dev.num_regions)],
            np.asarray(dev.planes)[:int(dev.num_regions)], atol=1e-4)

    def test_sharded_ccl_matches(self, mesh):
        pts = fixtures.clustering_fixture_cloud(16)
        elig = np.ones((16, 16), bool)
        cfg = ClusterRegionConfig()

        single = np.asarray(connectivity.connected_components_window(
            jnp.asarray(pts), jnp.asarray(elig),
            cfg.squared_distance_threshold, cfg.half_search_window))

        fn = jax.jit(jax.shard_map(
            lambda p, e: sharded.sharded_connected_components(
                p, e, cfg.squared_distance_threshold,
                cfg.half_search_window, 16, 16, "space"),
            mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec(None, "space", None),
                      jax.sharding.PartitionSpec(None, "space")),
            out_specs=jax.sharding.PartitionSpec(None, "space"),
            check_vma=False))
        multi = np.asarray(fn(jnp.asarray(pts), jnp.asarray(elig)))
        np.testing.assert_array_equal(single, multi)


class TestShardedBatchedGrower:
    def test_matches_single_device_batched(self, mesh):
        """The production batched grower, column-sharded, must reproduce the
        single-device batched output (same epochs, same rank algebra; psum
        refits are exact because the merge algebra is addition)."""
        from pcseg_tpu.models import planar_batched
        from pcseg_tpu import oracle
        P = jax.sharding.PartitionSpec

        pts, origin = room()
        nrm = oracle.compute_normals_organized(pts, origin)
        h, w = pts.shape[:2]
        cfg = PlanarRegionConfig()

        ranked = seeds_op.seeds_from_plane_support(
            jnp.asarray(pts), jnp.asarray(nrm))
        labels0 = jnp.full((h, w), UNLABELED, jnp.int32)
        single = planar_batched.grow_planar_regions_batched(
            jnp.asarray(pts), jnp.asarray(nrm), labels0,
            ranked.indices, ranked.valid, cfg, 0)

        fn = jax.jit(jax.shard_map(
            lambda p, n, si, sv: sharded.sharded_grow_planar_regions_batched(
                p, n, jnp.full((h, w // NDEV), UNLABELED, jnp.int32),
                si, sv, cfg, h, w, "space", 0),
            mesh=mesh,
            in_specs=(P(None, "space", None), P(None, "space", None),
                      P(), P()),
            out_specs=planar_model.PlanarRegions(
                labels=P(None, "space"), num_regions=P(), planes=P(),
                centroids=P(), curvatures=P(), counts=P(),
                seed_indices=P(),
                moments=sharded.plane_fit.PlaneMoments(
                    s2=P(), s1=P(), w=P(), normal_hint=P()),
                overflow=P()),
            check_vma=False))
        multi = fn(jnp.asarray(pts), jnp.asarray(nrm),
                   ranked.indices, ranked.valid)

        assert int(multi.num_regions) == int(single.num_regions)
        agree = (np.asarray(multi.labels) == np.asarray(single.labels)).mean()
        assert agree >= 0.99, agree
        ns = int(single.num_regions)
        np.testing.assert_allclose(np.asarray(multi.counts)[:ns],
                                   np.asarray(single.counts)[:ns], atol=16)
        for i in range(ns):
            dot = abs(float(np.asarray(multi.planes)[i, :3]
                            @ np.asarray(single.planes)[i, :3]))
            assert dot > 0.999


class TestShardedSeedTopK:
    def test_matches_replicated_ranking(self, mesh):
        from pcseg_tpu import oracle
        P = jax.sharding.PartitionSpec
        pts, origin = room()
        nrm = oracle.compute_normals_organized(pts, origin)
        h, w = pts.shape[:2]
        params = SeedsFromPlaneSupportParams()

        # single-device natural-orientation ranking (the sharded pipeline's
        # documented convention)
        count, ok = seeds_op.plane_support_counts(
            jnp.asarray(pts), jnp.asarray(nrm), params)
        qualifies = ok & (count >= params.min_num_support_points)
        want_idx, want_valid = seeds_op.rank_plane_support_seeds(
            count, qualifies, h, w, params.max_seeds)

        fn = jax.jit(jax.shard_map(
            lambda p, n: sharded.sharded_plane_support_seeds(
                p, n, params, h, w, "space"),
            mesh=mesh,
            in_specs=(P(None, "space", None), P(None, "space", None)),
            out_specs=(P(), P()),
            check_vma=False))
        got_idx, got_valid = fn(jnp.asarray(pts), jnp.asarray(nrm))
        # vector lengths differ (single-device caps at min(hw, max_seeds);
        # sharded pads to max_seeds) — the valid ascending tail must match
        gi = np.asarray(got_idx)[np.asarray(got_valid)]
        wi = np.asarray(want_idx)[np.asarray(want_valid)]
        np.testing.assert_array_equal(gi, wi)


@pytest.mark.slow
class TestShardedFullScale:
    def test_full_step_560_columns(self, mesh):
        """Sharded-vs-single equivalence at parity scale (560x560 — the
        PARITY_VGA scene, 70 columns per shard): the 48x64 tests cannot
        see shard-count-dependent effects like multi-hop halo reach or
        stage-A forks at scale. Square grid: the sharded path ranks seeds
        in natural orientation while the single path replicates the
        reference's transposed-access quirk (well-defined only on square
        grids), so dense region ids only align when H == W. (-m slow)"""
        pts, origin = fixtures.synthetic_room_cloud(560, 560, f=560.0,
                                                    seed=1)
        from pcseg_tpu.models import pipeline
        seg = pipeline.Segmenter(pipeline.SegmenterConfig())
        final, nrm, dev, cres = seg.device_forward(
            jnp.asarray(pts), jnp.asarray(origin))

        step = sharded.build_sharded_segment_step(mesh)
        out = step(jnp.asarray(pts), jnp.asarray(origin))

        assert int(out.planar.num_regions) == int(dev.num_regions)
        agree = (np.asarray(out.planar.labels)
                 == np.asarray(dev.labels)).mean()
        assert agree >= 0.99, agree
        ns = int(dev.num_regions)
        for i in range(ns):
            dot = abs(float(np.asarray(out.planar.planes)[i, :3]
                            @ np.asarray(dev.planes)[i, :3]))
            assert dot > 0.999, (i, dot)
