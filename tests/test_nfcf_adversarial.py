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


def _decode_all(sig):
    frames = NfcDecoder(
        enable_nfca=False, enable_nfcb=False, enable_nfcv=False
    ).decode(np.asarray(sig, np.float32), RATE)
    return [
        f for f in frames
        if f.frame_type in (int(FrameType.NfcPollFrame),
                            int(FrameType.NfcListenFrame))
    ]


def _atqc():
    body = bytes([0x12, 0x01]) + bytes(range(1, 17))
    return body + crc_f(body)


def test_listen_roundtrip_reqc_atqc():
    """REQC poll + ATQC tag response: the response inside the guard..
    waiting window decodes as a LISTEN frame, byte-exact with no flags
    (the bundled F fixtures carry only well-formed listen frames)."""
    body = bytes.fromhex("0600ffff0000")
    poll = body + crc_f(body)
    resp = _atqc()
    w = FPollWriter()
    w.frame(poll)
    w.listen_frame(resp)
    frames = _decode_all(w.build())
    assert [(f.frame_type, f.data) for f in frames] == [
        (int(FrameType.NfcPollFrame), poll),
        (int(FrameType.NfcListenFrame), resp),
    ]
    assert all(not f.has_flags(FrameFlags.CrcError) for f in frames)
    assert frames[1].frame_rate == frames[0].frame_rate


def test_listen_crc_error_flagged():
    body = bytes.fromhex("0600ffff0000")
    poll = body + crc_f(body)
    bad = bytearray(_atqc())
    bad[-2] ^= 0x08
    w = FPollWriter()
    w.frame(poll)
    w.listen_frame(bytes(bad))
    frames = _decode_all(w.build())
    assert len(frames) == 2
    assert frames[1].data == bytes(bad)
    assert frames[1].has_flags(FrameFlags.CrcError)
    assert not frames[0].has_flags(FrameFlags.CrcError)


def test_python_fsm_agrees_on_listen_signals(monkeypatch):
    """Pure-Python NfcF walker must produce identical listen frames
    (flags included) for the error-injected response."""
    body = bytes.fromhex("0600ffff0000")
    poll = body + crc_f(body)
    bad = bytearray(_atqc())
    bad[-2] ^= 0x08
    w = FPollWriter()
    w.frame(poll)
    w.listen_frame(bytes(bad))
    w.gap()
    w.frame(poll)
    w.listen_frame(_atqc(), polarity=1)
    sig = w.build()

    native = _decode_all(sig)

    from nfclab.runtime import native_walk

    monkeypatch.setattr(native_walk, "native_decode_lib", lambda: None)
    monkeypatch.setattr(
        native_walk, "run_native_detect_all", lambda ctx, c, t, t0, t1: t0
    )
    monkeypatch.setattr(
        native_walk, "run_native_span", lambda ctx, d, t0, t1: t0
    )
    pure = _decode_all(sig)
    assert pure == native
    assert len(pure) == 4
    assert pure[1].has_flags(FrameFlags.CrcError)
