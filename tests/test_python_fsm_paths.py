"""Pure-Python FSM parity: with the native decode/detect fast paths disabled,
the Python event walkers must still match the goldens exactly.

The C++ FSMs (decode_a/b/f/v.cpp, detect_span.cpp) are exact ports of these
Python walkers; this suite keeps the originals honest so the ports always
have a live reference implementation to diff against.  Conditioning and the
channel builders stay native (they are the bit-exact oracle either way).
"""

import pytest

from tests.test_golden import run_fixture


@pytest.fixture()
def python_fsms(monkeypatch):
    from nfclab.runtime import native_walk

    monkeypatch.setattr(native_walk, "native_decode_lib", lambda: None)
    monkeypatch.setattr(
        native_walk, "run_native_detect_all", lambda ctx, c, t, t0, t1: t0
    )
    monkeypatch.setattr(
        native_walk, "run_native_span", lambda ctx, d, t0, t1: t0
    )


# ALL 18 fixtures: every native-only decode path must have a live Python
# reference (round-2 review: spot-checking 6 left 12 fixtures exercising
# native-only branches)
ALL_FIXTURES = [
    "test_NFC-A_106kbps_001",   # A poll + ASK listen + short frames
    "test_NFC-A_106kbps_002",
    "test_NFC-A_106kbps_003",
    "test_NFC-A_106kbps_004",
    "test_NFC-A_106kbps_212kbps_001",  # A mid-stream rate switch
    "test_NFC-A_212kbps_001",
    "test_NFC-A_424kbps_001",   # A BPSK listen
    "test_NFC-A_424kbps_002",
    "test_NFC-B_106kbps_001",   # B NRZ poll + TR1/S1/S2 listen
    "test_NFC-B_106kbps_002",
    "test_NFC-F_212kbps_001",   # F Manchester
    "test_NFC-F_212kbps_002",
    "test_NFC-F_212kbps_003",
    "test_NFC-F_212kbps_004",
    "test_NFC-V_26kbps_001",    # V PPM + two-burst listen
    "test_NFC-V_26kbps_002",
    "test_POLL_AB_001",         # multi-tech interplay
    "test_POLL_ABF_001",
]


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_python_walkers_match_golden(fixture_dir, python_fsms, name):
    run_fixture(fixture_dir, name)
