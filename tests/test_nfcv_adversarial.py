"""Adversarial NFC-V (ISO15693) poll decoding over synthesized PPM
waveforms — round-trip validation, CRC corruption flagging, and the
1-of-256 code path (which no bundled fixture exercises as a poll)."""

import numpy as np
import pytest

from nfcv_synth import LEN256, P1, P2, PAUSE, SLOT_F, VPollWriter, crc_b

from nfclab.core.frame import FrameFlags, FrameType
from nfclab.runtime.decoder import NfcDecoder


def _native_ok():
    from nfclab.native.binding import native_available

    return native_available()


pytestmark = pytest.mark.skipif(
    not _native_ok(), reason="native library unavailable"
)

RATE = 10_000_000


def decode(sig):
    frames = NfcDecoder(
        enable_nfca=False, enable_nfcb=False, enable_nfcf=False
    ).decode(np.asarray(sig, np.float32), RATE)
    return [f for f in frames if f.frame_type == int(FrameType.NfcPollFrame)]


def test_synth_roundtrip_inventory():
    body = b"\x26\x01\x00"
    frame = body + crc_b(body)
    w = VPollWriter()
    w.frame(frame)
    polls = decode(w.build())
    assert [f.data for f in polls] == [frame]
    assert not polls[0].has_flags(FrameFlags.CrcError)
    # 1-of-4: 26.48 kbps nominal rate reported
    assert 26000 <= polls[0].frame_rate <= 27000


def test_crc_error_flagged():
    body = b"\x26\x01\x00"
    good = body + crc_b(body)
    bad = bytearray(good)
    bad[-1] ^= 0x10
    w = VPollWriter()
    w.frame(good)
    # past the frame-waiting time, so the decoder gives up on a listen
    # response and returns to poll search before the second frame
    w.gap(800_000)
    w.frame(bytes(bad))
    polls = decode(w.build())
    assert len(polls) == 2
    assert not polls[0].has_flags(FrameFlags.CrcError)
    assert polls[1].has_flags(FrameFlags.CrcError)
    assert polls[1].data == bytes(bad)


def test_one_of_256_code_path():
    """1-of-256 coding (8 bits/symbol, SOF second pulse at 4*p1): decode a
    single-byte-payload frame — the slow code path has no fixture."""
    body = b"\x22\x01"
    frame = body + crc_b(body)
    w = VPollWriter()
    # manual SOF for 1-of-256: peak2 == symbolStart + 4*p1
    e0 = w.n + PAUSE
    e1 = e0 + 4 * P1 - P2
    w.pauses += [e0, e1]
    w._window = e1  # symbolEnd = correlatedPeakTime for 1-of-256
    for b in frame:
        w.pauses.append(w._window + round((b + 1) * SLOT_F))
        w._window += LEN256
    w.pauses.append(w._window + P1 + P1 // 2)  # EOF
    w._window += 2 * P1
    w.n = w._window + 4096
    polls = decode(w.build())
    assert [f.data for f in polls] == [frame]
    assert not polls[0].has_flags(FrameFlags.CrcError)
    # 1-of-256: ~1.65 kbps nominal rate
    assert polls[0].frame_rate < 2000
