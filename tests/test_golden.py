"""Golden decode regression — the load-bearing acceptance suite.

Parity with the reference harness (src/nfc-test/test-sdr/src/main/cpp/main.cpp:
196-218): decode every bundled wav capture with all four NFC techs enabled and
compare the Poll/Listen frames against the paired .json ground truth with
strict equality (payload bytes + tech/type/flags/phase/rate + exact
sampleStart/sampleEnd/sampleRate).
"""

from pathlib import Path

import pytest

from nfclab.io.golden import GOLDEN_TYPES, read_golden_frames
from nfclab.runtime.decoder import NfcDecoder

ALL_FIXTURES = [
    "test_NFC-A_106kbps_001",
    "test_NFC-A_106kbps_002",
    "test_NFC-A_106kbps_003",
    "test_NFC-A_106kbps_004",
    "test_NFC-A_106kbps_212kbps_001",
    "test_NFC-A_212kbps_001",
    "test_NFC-A_424kbps_001",
    "test_NFC-A_424kbps_002",
    "test_NFC-B_106kbps_001",
    "test_NFC-B_106kbps_002",
    "test_NFC-F_212kbps_001",
    "test_NFC-F_212kbps_002",
    "test_NFC-F_212kbps_003",
    "test_NFC-F_212kbps_004",
    "test_NFC-V_26kbps_001",
    "test_NFC-V_26kbps_002",
    "test_POLL_ABF_001",
    "test_POLL_AB_001",
]


def run_fixture(fixture_dir: Path, name: str, **dec_kwargs):
    dec = NfcDecoder(**dec_kwargs)
    frames = dec.decode_wav(str(fixture_dir / f"{name}.wav"))
    got = [f for f in frames if f.frame_type in GOLDEN_TYPES]
    want = read_golden_frames(str(fixture_dir / f"{name}.json"))
    assert len(got) == len(want), (
        f"{name}: frame count {len(got)} != {len(want)}\n"
        + "\n".join(repr(f) for f in got[:20])
    )
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"{name}[{i}]: {g.diff(w)}\n got: {g}\nwant: {w}"


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_golden_all_techs(fixture_dir, name):
    run_fixture(fixture_dir, name)


def test_idle_fast_path_fires(fixture_dir):
    """The detect walk's idle scan must actually skip samples on a real
    capture (observability counters from detect_span.cpp)."""
    from nfclab.io.wav import read_wav
    from nfclab.native.binding import detect_stats_native, native_available
    from nfclab.runtime.decoder import NfcDecoder

    if not native_available():
        import pytest

        pytest.skip("native library unavailable")
    sk0, st0 = detect_stats_native()
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    NfcDecoder().decode(samples, info.sample_rate)
    sk1, st1 = detect_stats_native()
    assert sk1 - sk0 > 10_000, "idle fast path never skipped"
    assert st1 - st0 > 0
