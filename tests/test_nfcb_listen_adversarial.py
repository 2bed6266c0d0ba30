"""Adversarial NFC-B BPSK listen decoding over synthesized waveforms —
round-trip validation, CRC corruption, stream errors (bad stop bit) and
mid-frame subcarrier loss (NfcB.cpp:572-679, 767-1040).  The bundled B
fixtures carry only well-formed listen frames."""

import numpy as np
import pytest

from nfcb_synth import BListenWriter, crc_b

from nfclab.core.frame import FrameFlags, FrameType
from nfclab.runtime.decoder import NfcDecoder


def _native_ok():
    from nfclab.native.binding import native_available

    return native_available()


pytestmark = pytest.mark.skipif(
    not _native_ok(), reason="native library unavailable"
)

RATE = 10_000_000
REQB = b"\x05\x00\x00" + crc_b(b"\x05\x00\x00")
ATQB_BODY = bytes.fromhex("50566473f200000000808171")
ATQB = ATQB_BODY + crc_b(ATQB_BODY)


def decode(sig):
    frames = NfcDecoder(
        enable_nfca=False, enable_nfcf=False, enable_nfcv=False
    ).decode(np.asarray(sig, np.float32), RATE)
    return [
        f for f in frames
        if f.frame_type in (int(FrameType.NfcPollFrame),
                            int(FrameType.NfcListenFrame))
    ]


def test_reqb_atqb_roundtrip():
    """REQB poll + BPSK ATQB response decode byte-exact with no flags."""
    w = BListenWriter()
    w.frame(REQB)
    w.listen_frame(ATQB)
    frames = decode(w.build())
    assert [(f.frame_type, f.data) for f in frames] == [
        (int(FrameType.NfcPollFrame), REQB),
        (int(FrameType.NfcListenFrame), ATQB),
    ]
    for f in frames:
        assert f.frame_rate == 105938
        assert not f.has_flags(FrameFlags.CrcError)
        assert not f.has_flags(FrameFlags.Truncated)


def test_listen_crc_error_flagged():
    bad = bytearray(ATQB)
    bad[-1] ^= 0x10
    w = BListenWriter()
    w.frame(REQB)
    w.listen_frame(bytes(bad))
    frames = decode(w.build())
    assert len(frames) == 2
    assert frames[1].data == bytes(bad)
    assert frames[1].has_flags(FrameFlags.CrcError)


def test_listen_bad_stop_bit_truncates():
    """A logic-0 stop bit is a stream error (NfcB.cpp:606-612): the frame
    closes with the bytes completed so far and the Truncated flag."""
    w = BListenWriter()
    w.frame(REQB)
    w.listen_frame(ATQB, bad_stop_at=4)
    frames = decode(w.build())
    assert len(frames) == 2
    listen = frames[1]
    assert listen.frame_type == int(FrameType.NfcListenFrame)
    assert listen.has_flags(FrameFlags.Truncated)
    assert listen.data == ATQB[:4]


def test_listen_subcarrier_loss_mid_frame_wedges_decoder():
    """Killing the subcarrier after byte 2 (no EOF): PatternO never
    re-arms the sync cadence (NfcB.cpp:987-996 arms only once per symbol;
    the :1006 return skips the cadence advance), so the fragment is
    DISCARDED and the tech stays wedged in listen decode for the rest of
    the capture — reference-exact: NfcDecoder.cpp:404 runs detectCarrier
    only during modulation search, so not even a field off/on cycle
    reaches the carrier detector while a tech holds the modulation."""
    w = BListenWriter()
    w.frame(REQB)
    w.listen_frame(ATQB, cut_after=2)
    w.gap()
    w.frame(REQB)          # wedged: NOT decoded
    w.listen_frame(ATQB)
    w.field_off()
    w.gap(50_000)
    w.frame(REQB)          # still wedged: NOT decoded either
    frames = decode(w.build())
    assert [f.data for f in frames] == [REQB]


def test_field_cycle_between_exchanges():
    """Control for the wedge test: with a properly closed first frame, a
    carrier off/on cycle between exchanges resets cleanly and the second
    exchange decodes."""
    w = BListenWriter()
    w.frame(REQB)
    w.listen_frame(ATQB)
    w.field_off()
    w.gap(50_000)   # power-average settle after carrier-on
    w.frame(REQB)
    w.listen_frame(ATQB)
    frames = decode(w.build())
    assert [f.data for f in frames] == [REQB, ATQB, REQB, ATQB]


def test_python_fsm_agrees_on_b_listen_signals(monkeypatch):
    """Pure-Python NfcB walker produces identical frames (flags included)
    for the error-injected BPSK waveforms."""
    w = BListenWriter()
    w.frame(REQB)
    w.listen_frame(ATQB, bad_stop_at=4)
    w.gap()
    w.frame(REQB)
    w.listen_frame(ATQB, cut_after=2)
    sig = w.build()

    native = decode(sig)

    from nfclab.runtime import native_walk

    monkeypatch.setattr(native_walk, "native_decode_lib", lambda: None)
    monkeypatch.setattr(
        native_walk, "run_native_detect_all", lambda ctx, c, t, t0, t1: t0
    )
    monkeypatch.setattr(
        native_walk, "run_native_span", lambda ctx, d, t0, t1: t0
    )
    pure = decode(sig)
    assert pure == native
    # poll + truncated listen, then poll; the final cut wedges the tech
    assert len(pure) == 3
    assert pure[1].has_flags(FrameFlags.Truncated)


def test_bad_stop_on_zero_byte_reads_as_eof():
    """A logic-0 stop bit on a ZERO byte forms exactly the B EOF
    character (start 0 + 8 zero bits + 0), so the frame ends CLEANLY
    with the bytes so far — no Truncated flag, just the failing CRC
    (NfcB.cpp:604-608 checks frame-end before stream-error)."""
    w = BListenWriter()
    w.frame(REQB)
    w.listen_frame(ATQB, bad_stop_at=1)   # ATQB[1] == 0x56 -> truncates
    w.gap()
    w.frame(REQB)
    # REQB-like response: byte 2 is 0x00 -> bad stop there = EOF
    w.listen_frame(REQB, bad_stop_at=2)
    frames = decode(w.build())
    assert len(frames) == 4
    assert frames[1].data == ATQB[:1]
    assert frames[1].has_flags(FrameFlags.Truncated)
    assert frames[3].data == REQB[:2]
    assert not frames[3].has_flags(FrameFlags.Truncated)
    assert frames[3].has_flags(FrameFlags.CrcError)
