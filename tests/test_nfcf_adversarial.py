"""Adversarial NFC-F poll decoding over synthesized Manchester waveforms —
both polarities, CRC corruption, and sync-byte corruption (no bundled
fixture carries an errored F frame)."""

import numpy as np
import pytest

from nfcf_synth import FPollWriter, crc_f

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
        enable_nfca=False, enable_nfcb=False, enable_nfcv=False
    ).decode(np.asarray(sig, np.float32), RATE)
    return [f for f in frames if f.frame_type == int(FrameType.NfcPollFrame)]


def _polling_frame():
    payload = b"\x00\xff\xff\x01\x00"
    data = bytes([len(payload) + 1]) + payload
    return data + crc_f(data)


@pytest.mark.parametrize("polarity", [0, 1], ids=["observed", "reversed"])
def test_synth_roundtrip_polling(polarity):
    """FeliCa Polling round-trips in BOTH Manchester polarities (the
    detect locks observed/reversed mode at the preamble-to-sync edge)."""
    frame = _polling_frame()
    w = FPollWriter()
    w.frame(frame, polarity=polarity)
    polls = decode(w.build())
    assert [f.data for f in polls] == [frame]
    assert not polls[0].has_flags(FrameFlags.CrcError)
    assert 211000 <= polls[0].frame_rate <= 213000


def test_crc_error_flagged():
    good = _polling_frame()
    bad = bytearray(good)
    bad[-1] ^= 0x04
    w = FPollWriter()
    w.frame(good)
    w.gap()
    w.frame(bytes(bad))
    polls = decode(w.build())
    assert len(polls) == 2
    assert not polls[0].has_flags(FrameFlags.CrcError)
    assert polls[1].has_flags(FrameFlags.CrcError)
    assert polls[1].data == bytes(bad)


def test_sync_error_flagged():
    """A corrupted 0xB24D sync pair must flag SyncError on the frame
    (NfcF sync validation)."""
    frame = _polling_frame()
    w = FPollWriter()
    # patch the sync inside the generator's bit stream: corrupt one sync
    # bit by flipping a byte of the sync constant
    import nfcf_synth as fs

    bits = [0] * 48 + fs._bits_msb(b"\xb2\x4f") + fs._bits_msb(frame)
    n = int(round(len(bits) * fs.BIT_F))
    t = np.arange(n, dtype=np.float64)
    k = np.minimum((t / fs.BIT_F).astype(np.int64), len(bits) - 1)
    half = (t / fs.BIT_F - k) >= 0.5
    bvals = np.asarray(bits, np.int64)[k]
    first_low = bvals == 0
    low = np.where(half, ~first_low, first_low)
    w.chunks.append(np.where(low, fs.LOW, fs.HIGH).astype(np.float32))
    polls = decode(w.build())
    assert polls, "frame should still decode (sync tolerated with flag)"
    assert polls[0].has_flags(FrameFlags.SyncError)
