"""USB logic-analyzer drivers (DSLogic / Sipeed) against a mock libusb.

The reference captures ISO7816 probes over libusb from DSLogic
(DSLogicDevice.cpp: FPGA arm + stream-mode bulk capture) and Sipeed SLogic
(SipeedLogicDevice.cpp) hardware.  CI has no USB bus, so these tests build
a mock libusb-1.0 (tests/mock_libusb.cpp) that emulates both devices —
vendor control protocol plus bulk streams fed from files — and inject it
via NFCLAB_LIBUSB (usb_api.h loader override) into a subprocess, which
must enumerate the device, bring it up, stream a synthesized ISO7816
session through the real driver + pipeline chain, and decode the same
frames as the direct in-memory path.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from test_iso7816 import SAMPLE_RATE, make_session

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def mock_libusb(tmp_path_factory):
    out = tmp_path_factory.mktemp("mockusb") / "libmock_usb.so"
    src = Path(__file__).parent / "mock_libusb.cpp"
    subprocess.run(
        ["g++", "-O1", "-shared", "-fPIC", "-std=c++17", "-o", str(out),
         str(src)],
        check=True, capture_output=True,
    )
    return out


@pytest.fixture(scope="module")
def session_capture():
    capture = make_session(
        atr=(0x3B, 0x00), tpdu=(0x00, 0xB0, 0x00, 0x00, 0x02)
    )
    from nfclab.runtime.logic_decoder import IsoDecoder

    want = IsoDecoder().decode(capture, SAMPLE_RATE)
    assert want, "synthesized session must decode directly"
    return capture, want


def pack_sipeed(capture: np.ndarray) -> bytes:
    """One byte per sample, bit i = probe i (sri_samples semantics)."""
    bits = (capture > 0.5).astype(np.uint8)
    packed = np.zeros(len(bits), np.uint8)
    for c in range(bits.shape[1]):
        packed |= bits[:, c] << c
    return packed.tobytes()


def pack_dslogic(capture: np.ndarray) -> bytes:
    """DSLogic stream-mode layout (DSLogicDevice.cpp transpose()): chunks
    of channels*8 bytes; 8 consecutive bytes per channel; byte i of a
    channel holds samples 8i..8i+7 of the 64-sample block, LSB first."""
    bits = (capture > 0.5).astype(np.uint8)
    n, ch = bits.shape
    pad = (-n) % 64
    if pad:
        bits = np.vstack([bits, np.repeat(bits[-1:], pad, axis=0)])
    blocks = bits.reshape(-1, 8, 8, ch)  # [block, i, r, c]
    shifts = np.arange(8, dtype=np.uint8)[None, None, :, None]
    by = (blocks << shifts).sum(axis=2).astype(np.uint8)  # [block, i, c]
    return by.transpose(0, 2, 1).reshape(-1).tobytes()  # [block, c, i]


def run_child(mock: Path, ident: str, payload_env: str,
              payload: bytes, tmp_path: Path,
              sync: bool = False) -> list[dict]:
    payload_file = tmp_path / "payload.bin"
    payload_file.write_bytes(payload)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["NFCLAB_LIBUSB"] = str(mock)
    env[payload_env] = str(payload_file)
    if sync:  # force the synchronous bulk reader (async engine otherwise)
        env["NFCLAB_USB_SYNC"] = "1"
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).parent / "usb_logic_child.py"),
         ident, str(SAMPLE_RATE)],
        capture_output=True, text=True, timeout=120, env=env, cwd=str(REPO),
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    line = [l for l in proc.stdout.splitlines() if l.startswith("FRAMES:")]
    assert line, (proc.stdout, proc.stderr)
    return json.loads(line[0][len("FRAMES:"):])


def check_frames(got: list[dict], want) -> None:
    assert len(got) == len(want), (got, [repr(f) for f in want])
    for g, w in zip(got, want):
        assert g["data"] == w.data.hex(), (g, repr(w))
        assert g["tech_type"] == w.tech_type
        assert g["frame_type"] == w.frame_type
        assert g["frame_flags"] == w.frame_flags
        assert g["sample_start"] == w.sample_start
        assert g["sample_end"] == w.sample_end
        assert g["sample_rate"] == w.sample_rate


@pytest.mark.parametrize("sync", [False, True], ids=["async", "sync"])
def test_sipeed_e2e_decodes_iso7816(mock_libusb, session_capture, tmp_path,
                                    sync):
    """Both transfer engines: the async multi-transfer pool (reference
    Usb.cpp transferHandler parity, default) and the synchronous fallback
    (NFCLAB_USB_SYNC=1) must stream + decode identically."""
    capture, want = session_capture
    got = run_child(mock_libusb, "sipeed://", "NFCLAB_MOCK_PAYLOAD_SIPEED",
                    pack_sipeed(capture), tmp_path, sync=sync)
    check_frames(got, want)


@pytest.mark.parametrize("sync", [False, True], ids=["async", "sync"])
def test_dslogic_e2e_decodes_iso7816(mock_libusb, session_capture, tmp_path,
                                     sync):
    capture, want = session_capture
    got = run_child(mock_libusb, "dslogic://", "NFCLAB_MOCK_PAYLOAD_DSLOGIC",
                    pack_dslogic(capture), tmp_path, sync=sync)
    check_frames(got, want)


def test_real_libusb_absent_is_harmless():
    """Without the mock, the drivers bind the system libusb (or nothing)
    and must enumerate no dslogic/sipeed devices yet still register."""
    from nfclab.native.binding import native_available, sdr_drivers

    if not native_available():
        pytest.skip("native library unavailable")
    drivers = sdr_drivers()
    assert "dslogic" in drivers and "sipeed" in drivers
