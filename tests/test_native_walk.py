

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


def test_merge_sorted_native_concurrent():
    """Per-thread scratch: concurrent merges (decode_batch workers) must
    not alias each other's buffers."""
    import threading

    from nfclab.native.binding import merge_sorted_native

    errs = []

    def worker(seed):
        r = np.random.default_rng(seed)
        for _ in range(100):
            parts = [
                np.sort(r.integers(0, 100_000, int(r.integers(100, 5000))))
                .astype(np.int64)
                for _ in range(int(r.integers(2, 9)))
            ]
            got = merge_sorted_native(parts)
            if not np.array_equal(got, np.sort(np.concatenate(parts))):
                errs.append(seed)
                return

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
