"""Adversarial NFC-B poll decoding over synthesized ASK NRZ waveforms —
round-trip validation and CRC_B corruption flagging (no bundled fixture
carries an errored B frame)."""

import numpy as np
import pytest

from nfcb_synth import BPollWriter, crc_b

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
        enable_nfca=False, enable_nfcf=False, enable_nfcv=False
    ).decode(np.asarray(sig, np.float32), RATE)
    return [f for f in frames if f.frame_type == int(FrameType.NfcPollFrame)]


def test_synth_roundtrip_reqb():
    body = b"\x05\x00\x00"
    frame = body + crc_b(body)
    w = BPollWriter()
    w.frame(frame)
    polls = decode(w.build())
    assert [f.data for f in polls] == [frame]
    assert not polls[0].has_flags(FrameFlags.CrcError)
    assert 105000 <= polls[0].frame_rate <= 107000


def test_crc_error_flagged():
    body = b"\x05\x00\x00"
    good = body + crc_b(body)
    bad = bytearray(good)
    bad[-2] ^= 0x40
    w = BPollWriter()
    w.frame(good)
    w.gap()
    w.frame(bytes(bad))
    polls = decode(w.build())
    assert len(polls) == 2
    assert not polls[0].has_flags(FrameFlags.CrcError)
    assert polls[1].has_flags(FrameFlags.CrcError)
    assert polls[1].data == bytes(bad)


def test_attrib_roundtrip():
    """ATTRIB (1D + PUPI + params) — the other REQB-family poll shape."""
    body = b"\x1d\x01\x02\x03\x04\x00\x08\x01\x00"
    frame = body + crc_b(body)
    w = BPollWriter()
    w.frame(frame)
    polls = decode(w.build())
    assert [f.data for f in polls] == [frame]
    assert not polls[0].has_flags(FrameFlags.CrcError)
