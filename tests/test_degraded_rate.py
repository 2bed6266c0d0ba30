"""Degraded-mode parity: 3.2 MS/s 8-bit capture (the reference's RTL-SDR
mode, README.md:193-201 — "only 106 kbps commands + some responses").

A golden 106 kbps capture is decimated to 3.2 MS/s and quantized to 8 bits;
the rate-generic channel plan must still decode every POLL command
byte-exactly.  Listen frames survive only partially at this rate (the
848 kHz ASK subcarrier aliases under decimation), matching the reference's
own degraded-mode caveat — the test pins their presence, not their bytes.
"""

import numpy as np
import pytest

from nfclab.core.frame import FrameType
from nfclab.io.golden import read_golden_frames
from nfclab.io.wav import read_wav


def _native_ok():
    from nfclab.native.binding import native_available

    return native_available()


pytestmark = pytest.mark.skipif(
    not _native_ok(), reason="decode requires the native library"
)


def test_32msps_8bit_commands_decode_byte_exact(fixture_dir):
    from nfclab.runtime.decoder import NfcDecoder

    samples, info = read_wav(
        str(fixture_dir / "test_NFC-A_106kbps_001.wav")
    )
    rate = 3_200_000
    t_old = np.arange(len(samples)) / info.sample_rate
    n_new = int(len(samples) * rate / info.sample_rate)
    x = np.interp(np.arange(n_new) / rate, t_old, samples)
    # 8-bit magnitude quantization (RTL-SDR depth)
    x = (np.round(x * 255) / np.float32(255)).astype(np.float32)

    frames = NfcDecoder().decode(x, rate)
    want = read_golden_frames(
        str(fixture_dir / "test_NFC-A_106kbps_001.json")
    )
    want_polls = [
        f.data.hex() for f in want
        if f.frame_type == int(FrameType.NfcPollFrame)
    ]
    got_polls = [
        f.data.hex() for f in frames
        if f.frame_type == int(FrameType.NfcPollFrame) and f.data
    ]
    assert got_polls == want_polls  # every command, byte-exact
    got_listens = [
        f for f in frames
        if f.frame_type == int(FrameType.NfcListenFrame) and f.data
    ]
    assert len(got_listens) >= 3  # "some responses" (reference caveat)
