"""Hardware smoke harness (test-dio parity, nfclab.tools.hw_smoke).

Mirrors the reference's test-dio: enumerate devices, open one, stream,
record to WAV.  Runs against the loopback device (always present) and
against the mock-libusb Sipeed device (full USB capture-to-WAV chain).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

from test_iso7816 import SAMPLE_RATE, make_session
from test_usb_logic import mock_libusb, pack_sipeed  # noqa: F401 (fixture)

REPO = Path(__file__).resolve().parent.parent


def _run(args, env=None, timeout=120):
    proc = subprocess.run(
        [sys.executable, "-m", "nfclab.tools.hw_smoke", *args],
        capture_output=True, text=True, timeout=timeout, cwd=str(REPO),
        env=env,
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    return [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]


def test_enumerate_lists_all_drivers():
    (listing,) = _run([])
    assert listing["native"]
    for name in ("loopback", "logicloop", "dslogic", "sipeed", "airspy"):
        assert name in listing["drivers"]


def test_loopback_capture_to_wav(tmp_path):
    out = tmp_path / "cap.wav"
    listing, result = _run(
        ["--capture", "logicloop://test", "--seconds", "0.3",
         "--out", str(out)]
    )
    assert result["opened"] and result["samples"] > 0
    from nfclab.io.wav import read_wav

    samples, info = read_wav(str(out))
    assert info.channels == 4 and info.sample_rate == result["sample_rate"]
    # 8-bit logic rails: 0.0 and the saturated positive full scale 127/128
    assert set(np.unique(samples)) <= {0.0, np.float32(127 / 128)}


def test_sipeed_usb_capture_matches_payload(mock_libusb, tmp_path):  # noqa: F811
    capture = make_session(atr=(0x3B, 0x00))
    payload_file = tmp_path / "payload.bin"
    payload_file.write_bytes(pack_sipeed(capture))
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["NFCLAB_LIBUSB"] = str(mock_libusb)
    env["NFCLAB_MOCK_PAYLOAD_SIPEED"] = str(payload_file)
    out = tmp_path / "cap.wav"
    listing, result = _run(
        ["--capture", "sipeed://", "--seconds", "3", "--out", str(out),
         "--sample-rate", str(SAMPLE_RATE)],
        env=env,
    )
    assert listing["drivers"]["sipeed"] == ["sipeed://1:4"]
    assert result["opened"] and result["samples"] > 0
    from nfclab.io.wav import read_wav

    samples, info = read_wav(str(out))
    assert info.sample_rate == SAMPLE_RATE and info.channels == 4
    n = min(len(samples), len(capture))
    assert n > 0
    np.testing.assert_array_equal(samples[:n] > 0.5, capture[:n] > 0.5)
