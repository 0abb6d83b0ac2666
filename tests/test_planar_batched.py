"""Batched planar growth vs the sequential device path and the oracle."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcseg_tpu.models.config import (
    UNLABELED, PlanarRegionConfig, SeedsFromPlaneSupportParams)
from pcseg_tpu.models import planar_batched, boundary
from pcseg_tpu.ops import seeds as seeds_op
from pcseg_tpu import oracle
from tests import fixtures
from tests.test_planar import run_oracle


def run_batched(points, normals, config=PlanarRegionConfig(), offset=0):
    ranked = seeds_op.seeds_from_plane_support(
        jnp.asarray(points), jnp.asarray(normals))
    labels0 = jnp.full(points.shape[:2], UNLABELED, jnp.int32)
    fn = jax.jit(lambda p, n, l, si, sv:
                 planar_batched.grow_planar_regions_batched(
                     p, n, l, si, sv, config, offset))
    dev = fn(jnp.asarray(points), jnp.asarray(normals), labels0,
             ranked.indices, ranked.valid)
    labels, records = boundary.finalize_planar_regions(
        np.asarray(points, np.float32), np.asarray(normals), dev, config,
        offset)
    return labels, records, dev


def _scene(n=40, seed=2):
    pts, origin = fixtures.synthetic_room_cloud(n, n, f=float(n), seed=seed)
    normals = oracle.compute_normals_organized(pts, origin)
    return pts, normals


class TestBatchedGrowth:
    def test_room_scene_vs_oracle(self):
        pts, normals = _scene(40)
        got_labels, records, dev = run_batched(pts, normals)
        want_labels, want_regions = run_oracle(pts, normals)
        agreement = (got_labels == want_labels).mean()
        assert agreement >= 0.99, agreement
        assert len(records) == len(want_regions)
        for rec, want in zip(records, want_regions):
            dot = abs(float(rec.plane[:3] @ want.plane[:3]))
            assert dot > 0.999

    def test_multi_plane_discovery_across_epochs(self):
        """Walls hidden behind the dominant floor's seed crowd must be
        found via founder reassignment."""
        pts, normals = _scene(48, seed=5)
        cfg = dataclasses.replace(PlanarRegionConfig(), max_regions=8)
        got_labels, records, dev = run_batched(pts, normals, cfg)
        want_labels, want_regions = run_oracle(pts, normals)
        assert len(records) == len(want_regions)
        agreement = (got_labels == want_labels).mean()
        assert agreement >= 0.99, agreement
        for rec, want in zip(records, want_regions):
            assert rec.count == len(want.inlier_indices)
            assert abs(float(rec.plane[:3] @ want.plane[:3])) > 0.999

    def test_bordered_plane(self):
        pts = np.full((24, 24, 3), np.nan, np.float32)
        pts[2:22, 2:22] = fixtures.analytic_plane_cloud(
            20, 20, normal=(0, 0, 1), d=1.0, step=0.1)
        normals = oracle.compute_normals_organized(
            pts, np.array([0, 0, 5.0], np.float32))
        got_labels, records, dev = run_batched(pts, normals)
        want_labels, want_regions = run_oracle(pts, normals)
        assert len(records) == len(want_regions) == 1
        agreement = (got_labels == want_labels).mean()
        assert agreement >= 0.99, agreement

    def test_empty_seeds(self):
        pts, normals = _scene(24)
        labels0 = jnp.full(pts.shape[:2], UNLABELED, jnp.int32)
        dev = planar_batched.grow_planar_regions_batched(
            jnp.asarray(pts), jnp.asarray(normals), labels0,
            jnp.zeros((4,), jnp.int32), jnp.zeros((4,), bool))
        assert int(dev.num_regions) == 0


class TestPallasFlood:
    def test_matches_xla_fixed_point(self):
        """The in-VMEM Pallas flood kernel must reach the same fixed point
        as the XLA while_loop formulation (interpret mode on CPU)."""
        rng = np.random.default_rng(5)
        k, h, w = 40, 48, 64
        gate = rng.random((k, h, w)) < 0.55
        src = gate & (rng.random((k, h, w)) < 0.02)
        g = planar_batched._pack_bits(jnp.asarray(gate))
        r0 = planar_batched._pack_bits(jnp.asarray(src & gate))
        want = planar_batched._unpack_bits(
            jax.jit(lambda g, r: planar_batched._flood_pallas(
                g, r, 64, interpret=True))(g, r0), k)
        got_xla = planar_batched.flood_fill_static(
            jnp.asarray(gate), jnp.asarray(src), 64)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got_xla))

    def test_boxed_max_run(self):
        rng = np.random.default_rng(8)
        k, h, w = 8, 32, 32
        gate = rng.random((k, h, w)) < 0.5
        # cap runs at 9 by construction: sever every 9th row/col
        gate[:, ::9, :] = False
        gate[:, :, ::9] = False
        src = gate & (rng.random((k, h, w)) < 0.05)
        g = planar_batched._pack_bits(jnp.asarray(gate))
        r0 = planar_batched._pack_bits(jnp.asarray(src & gate))
        want = planar_batched._unpack_bits(
            jax.jit(lambda g, r: planar_batched._flood_pallas(
                g, r, 64, max_run=9, interpret=True))(g, r0), k)
        got = planar_batched.flood_fill_static(
            jnp.asarray(gate), jnp.asarray(src), 64, max_run=9)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


class TestWordEpochKernel:
    def _run_vmapped(self, pts_b, nrm_b):
        """Grower over a leading frame axis (the streaming path's shape)."""
        def one(p, n):
            ranked = seeds_op.seeds_from_plane_support(p, n)
            labels0 = jnp.full(p.shape[:2], UNLABELED, jnp.int32)
            dev = planar_batched.grow_planar_regions_batched(
                p, n, labels0, ranked.indices, ranked.valid,
                PlanarRegionConfig(), 0, seed_rank_grid=ranked.rank_grid)
            return dev.labels, dev.num_regions, dev.planes
        return jax.jit(jax.vmap(one))(jnp.asarray(pts_b), jnp.asarray(nrm_b))

    def test_matches_xla_epochs_vmapped_patched_scale(self):
        """The megakernel's batch-grid path (one Pallas program per frame)
        must match the XLA epochs under vmap at a scale where the patched
        stage A is active (>= 128x128; planar_batched use_patches gate) —
        the exact impl combination that ships in device_forward_stream."""
        scenes = [_scene(128, seed=s) for s in (3, 7)]
        pts_b = np.stack([s[0] for s in scenes])
        nrm_b = np.stack([s[1] for s in scenes])
        old = planar_batched.EPOCH_IMPL
        planar_batched.EPOCH_IMPL = "xla"
        try:
            want_labels, want_n, want_planes = self._run_vmapped(pts_b, nrm_b)
        finally:
            planar_batched.EPOCH_IMPL = old
        planar_batched.EPOCH_IMPL = "pallas_interpret"
        try:
            got_labels, got_n, got_planes = self._run_vmapped(pts_b, nrm_b)
        finally:
            planar_batched.EPOCH_IMPL = old
        np.testing.assert_array_equal(np.asarray(got_n), np.asarray(want_n))
        np.testing.assert_array_equal(np.asarray(got_labels),
                                      np.asarray(want_labels))
        for b in range(2):
            n = int(want_n[b])
            np.testing.assert_allclose(np.asarray(got_planes)[b, :n],
                                       np.asarray(want_planes)[b, :n],
                                       rtol=0, atol=1e-4)

    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="real Mosaic lowering needs a TPU")
    def test_pallas_epoch_compiles_on_tpu(self):
        """Run EPOCH_IMPL='pallas' through real Mosaic (2-D SMEM outputs,
        batch grid axis, in-kernel while_loop) — the interpret tests cannot
        catch lowering regressions (that is exactly what shipped broken in
        round 3)."""
        pts, normals = _scene(64, seed=3)
        old = planar_batched.EPOCH_IMPL
        planar_batched.EPOCH_IMPL = "xla"
        try:
            want_labels, _, want_dev = run_batched(pts, normals)
        finally:
            planar_batched.EPOCH_IMPL = old
        planar_batched.EPOCH_IMPL = "pallas"
        try:
            got_labels, _, got_dev = run_batched(pts, normals)
        finally:
            planar_batched.EPOCH_IMPL = old
        assert int(got_dev.num_regions) == int(want_dev.num_regions)
        agree = (np.asarray(got_labels) == np.asarray(want_labels)).mean()
        assert agree >= 0.999, agree

    def test_matches_xla_epochs(self):
        """The in-VMEM epoch megakernel path (packed member word + per-slot
        reductions in one Pallas call) must reproduce the XLA epoch loop's
        regions (interpret mode on CPU)."""
        pts, normals = _scene(48, seed=3)
        want_labels, _, want_dev = run_batched(pts, normals)
        old = planar_batched.EPOCH_IMPL
        planar_batched.EPOCH_IMPL = "pallas_interpret"
        try:
            got_labels, _, got_dev = run_batched(pts, normals)
        finally:
            planar_batched.EPOCH_IMPL = old
        assert int(got_dev.num_regions) == int(want_dev.num_regions)
        np.testing.assert_array_equal(np.asarray(got_labels),
                                      np.asarray(want_labels))
        n = int(want_dev.num_regions)
        np.testing.assert_allclose(np.asarray(got_dev.planes)[:n],
                                   np.asarray(want_dev.planes)[:n],
                                   rtol=0, atol=1e-4)
