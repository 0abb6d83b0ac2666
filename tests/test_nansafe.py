"""Unit coverage for the bit-level finite test (ops/nansafe.py).

The per-dtype exponent masks are easy to typo and every production call
site is also equivalent to ``jnp.isfinite`` on CPU, so nothing else would
catch a wrong mask (ADVICE r4). Asserts exact agreement with
``jnp.isfinite`` over NaN / +-Inf / denormal / normal / zero values for
each supported float dtype, plus the int fallback.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pcseg_tpu.ops import nansafe


FLOAT_DTYPES = [jnp.float32, jnp.bfloat16, jnp.float16]


def _probe_values(dtype):
    info = jnp.finfo(dtype)
    return np.array([
        0.0, -0.0, 1.0, -1.5, 3.14159,
        float(info.max), float(info.min),          # largest normals
        float(info.tiny),                           # smallest normal
        float(info.tiny) / 2.0,                     # denormal
        float(info.eps),
        np.inf, -np.inf, np.nan, -np.nan,
    ], dtype=np.float64)


@pytest.mark.parametrize("dtype", FLOAT_DTYPES)
def test_isfinite_matches_jnp(dtype):
    x = jnp.asarray(_probe_values(dtype), dtype=dtype)
    got = np.asarray(nansafe.isfinite(x))
    want = np.asarray(jnp.isfinite(x))
    np.testing.assert_array_equal(got, want)


def test_isfinite_f64():
    # x64 path (masks for float64) — enable double precision locally
    import jax
    with jax.enable_x64():
        x = jnp.asarray(_probe_values(jnp.float64), dtype=jnp.float64)
        got = np.asarray(nansafe.isfinite(x))
        want = np.asarray(jnp.isfinite(x))
        np.testing.assert_array_equal(got, want)


def test_isfinite_nan_payloads():
    # quiet/signaling NaN payloads and every exponent-ones pattern
    bits = np.array([0x7F800001, 0xFF800001, 0x7FC00000, 0xFFC00000,
                     0x7FFFFFFF, 0x7F800000, 0xFF800000], np.uint32)
    x = jnp.asarray(bits.view(np.float32))
    assert not np.any(np.asarray(nansafe.isfinite(x)))


def test_isfinite_int_fallback():
    x = jnp.asarray([0, 1, -5, 2**31 - 1], jnp.int32)
    np.testing.assert_array_equal(np.asarray(nansafe.isfinite(x)),
                                  np.ones(4, bool))


def test_all_finite_axis():
    x = jnp.asarray([[1.0, 2.0, 3.0], [1.0, np.nan, 3.0],
                     [np.inf, 2.0, 3.0]], jnp.float32)
    np.testing.assert_array_equal(np.asarray(nansafe.all_finite(x)),
                                  [True, False, False])


def test_sanitize():
    x = jnp.asarray([1.0, np.nan, np.inf, -np.inf, 2.0], jnp.float32)
    np.testing.assert_array_equal(np.asarray(nansafe.sanitize(x, -1.0)),
                                  [1.0, -1.0, -1.0, -1.0, 2.0])
