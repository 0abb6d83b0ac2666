"""Native host-ops vs Python fallbacks."""

import numpy as np
import pytest

from pcseg_tpu import native
from pcseg_tpu.models import boundary


@pytest.fixture(scope="module")
def lib():
    lib = native.load_hostops()
    if lib is None:
        pytest.skip("no native toolchain")
    return lib


def _python_trace(mask, start):
    """Force the Python fallback path."""
    saved = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        return boundary.moore_trace(mask, start)
    finally:
        native._LIB, native._TRIED = saved


class TestNativeTrace:
    def test_matches_python_on_shapes(self, lib):
        rng = np.random.default_rng(3)
        for trial in range(10):
            mask = np.zeros((20, 24), bool)
            r0, c0 = rng.integers(2, 10), rng.integers(2, 12)
            rh, cw = rng.integers(3, 9), rng.integers(3, 11)
            mask[r0:r0 + rh, c0:c0 + cw] = True
            # poke holes / protrusions
            mask[rng.integers(0, 20), rng.integers(0, 24)] = True
            start = boundary.find_outer_start(mask)
            if start is None:
                continue
            # guard: start pixel may be the isolated poke (untraceable)
            rs, cs = start % 20, start // 20
            if not mask[max(0, rs-1):rs+2, max(0, cs-1):cs+2].sum() > 1:
                continue
            got = boundary.moore_trace(mask, start)
            want = _python_trace(mask, start)
            assert got == want, trial

    def test_flood_outside_matches(self, lib):
        rng = np.random.default_rng(5)
        mask = rng.random((16, 18)) < 0.4
        start_native = boundary.find_outer_start(mask)
        saved = native._LIB, native._TRIED
        native._LIB, native._TRIED = None, True
        try:
            start_python = boundary.find_outer_start(mask)
        finally:
            native._LIB, native._TRIED = saved
        assert start_native == start_python
