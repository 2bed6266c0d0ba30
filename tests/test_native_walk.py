

"""Native walk helper units."""

import numpy as np
import pytest


def _native_ok():
    from nfclab.native.binding import native_available

    return native_available()


pytestmark = pytest.mark.skipif(
    not _native_ok(), reason="native library unavailable"
)


def test_merge_sorted_native_property():
    """K-way candidate-union merge == sort(concat) for random sorted
    sources incl. empties and duplicates."""
    from nfclab.native.binding import merge_sorted_native

    rng = np.random.default_rng(11)
    for trial in range(50):
        k = int(rng.integers(1, 12))
        parts = [
            np.sort(rng.integers(0, 5000, int(rng.integers(0, 2000))))
            .astype(np.int64)
            for _ in range(k)
        ]
        got = merge_sorted_native(parts)
        assert np.array_equal(got, np.sort(np.concatenate(parts))), trial
