"""Batch decode API: conditioning once, parallel host walks."""

from nfclab.io.golden import GOLDEN_TYPES, read_golden_frames
from nfclab.runtime.batch import decode_batch


def test_decode_batch_matches_goldens(fixture_dir):
    names = ["test_NFC-A_106kbps_001", "test_NFC-A_106kbps_002"]
    paths = [str(fixture_dir / f"{n}.wav") for n in names]
    res = decode_batch(paths, workers=2, conditioner="native")
    for name, path in zip(names, paths):
        got = [f for f in res[path] if f.frame_type in GOLDEN_TYPES]
        want = read_golden_frames(str(fixture_dir / f"{name}.json"))
        assert got == want
