"""Determinism discipline (SURVEY.md §5): same input => same labels,
across repeated runs and across shardings.

The reference is single-threaded C++ (trivially deterministic); the JAX
rebuild's equivalent discipline is asserting bit-identical outputs across
executions and across mesh layouts. Note on jax.debug_nans: NaN is a DATA
value here (the reference's invalid-point convention,
multichannel_cloud.proto:30-31) and flows through every stage by design,
so a debug_nans run would trip on intended NaNs; the NaN-propagation
behavior is pinned by explicit tests instead (test_normals, test_cloud).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcseg_tpu.models import pipeline
from pcseg_tpu.parallel import sharded
from tests import fixtures


def _scene(h=48, w=64):
    return fixtures.synthetic_room_cloud(h, w, f=float(h), seed=4)


class TestDeterminism:
    def test_segment_frame_repeatable(self):
        pts, origin = _scene()
        seg = pipeline.Segmenter(pipeline.SegmenterConfig())
        a = seg.segment_frame(pts, origin)
        b = seg.segment_frame(pts.copy(), origin.copy())
        np.testing.assert_array_equal(a.labels, b.labels)
        assert len(a.planar_regions) == len(b.planar_regions)
        for ra, rb in zip(a.planar_regions, b.planar_regions):
            np.testing.assert_array_equal(ra.plane, rb.plane)
            assert ra.boundary_indices == rb.boundary_indices
            assert ra.area == rb.area

    def test_device_forward_repeatable(self):
        pts, origin = _scene()
        seg = pipeline.Segmenter(pipeline.SegmenterConfig())
        a = seg.device_forward(jnp.asarray(pts), jnp.asarray(origin))
        b = seg.device_forward(jnp.asarray(pts), jnp.asarray(origin))
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    def test_sharded_step_repeatable_and_matches_mesh_sizes(self):
        """Identical labels across two runs of the 8-shard step, and the
        region structure matches between 2-shard and 8-shard meshes."""
        assert len(jax.devices()) >= 8
        pts, origin = _scene()

        step8 = sharded.build_sharded_segment_step(sharded.make_mesh(8))
        r1 = step8(jnp.asarray(pts), jnp.asarray(origin))
        r2 = step8(jnp.asarray(pts), jnp.asarray(origin))
        np.testing.assert_array_equal(np.asarray(r1.labels),
                                      np.asarray(r2.labels))

        step2 = sharded.build_sharded_segment_step(sharded.make_mesh(2))
        r3 = step2(jnp.asarray(pts), jnp.asarray(origin))
        assert int(r3.planar.num_regions) == int(r1.planar.num_regions)
        assert int(r3.num_clusters) == int(r1.num_clusters)
        # f32 psum order differs between mesh sizes; labels must still
        # agree within the reference's own reduction-order tolerance
        # (>= 99% per-point, plane_estimator_test.cc:34-36)
        agree = (np.asarray(r3.labels) == np.asarray(r1.labels)).mean()
        assert agree >= 0.99, agree
