"""Golden decode regression — the load-bearing acceptance suite.

Parity with the reference harness (src/nfc-test/test-sdr/src/main/cpp/main.cpp:
196-218): decode every bundled wav capture and compare the Poll/Listen frames
against the paired .json ground truth with strict equality (payload bytes +
tech/type/flags/phase/rate + exact sampleStart/sampleEnd/sampleRate).
"""

import glob
from pathlib import Path

import pytest

from nfclab.io.golden import GOLDEN_TYPES, read_golden_frames
from nfclab.runtime.decoder import NfcDecoder

# fixtures currently expected to pass; grows as techs land
NFCA_FIXTURES = [
    "test_NFC-A_106kbps_001",
    "test_NFC-A_106kbps_002",
    "test_NFC-A_106kbps_003",
    "test_NFC-A_106kbps_004",
    "test_NFC-A_106kbps_212kbps_001",
    "test_NFC-A_212kbps_001",
    "test_NFC-A_424kbps_001",
    "test_NFC-A_424kbps_002",
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


NFCB_FIXTURES = [
    "test_NFC-B_106kbps_001",
    "test_NFC-B_106kbps_002",
    "test_POLL_AB_001",
]


@pytest.mark.parametrize("name", NFCA_FIXTURES)
def test_golden_nfca(fixture_dir, name):
    run_fixture(
        fixture_dir,
        name,
        enable_nfcf=False,
        enable_nfcv=False,
    )


@pytest.mark.parametrize("name", NFCB_FIXTURES)
def test_golden_nfcb(fixture_dir, name):
    run_fixture(
        fixture_dir,
        name,
        enable_nfcf=False,
        enable_nfcv=False,
    )
