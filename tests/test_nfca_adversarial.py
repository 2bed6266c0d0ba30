"""Adversarial NFC-A poll decoding over synthesized waveforms.

The bundled reference captures contain only well-formed frames (every
golden frameFlags is clean), so the ParityError / CrcError / ShortFrame
poll paths (NfcA.cpp:432-563 bit assembly + :1978-2006 checks) had no
coverage.  tests/nfca_synth.py builds 106 kbps modified-Miller waveforms;
these tests first validate the synthesizer round-trip, then inject
errors and assert the exact flagging behavior."""

import numpy as np
import pytest

from nfca_synth import PollWriter, crc_a

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
        enable_nfcb=False, enable_nfcf=False, enable_nfcv=False
    ).decode(np.asarray(sig, np.float32), RATE)
    return [f for f in frames if f.frame_type == int(FrameType.NfcPollFrame)]


def test_synth_roundtrip_well_formed():
    """Round-trip: synthesized REQA / HLTA+CRC / SEL decode byte-exact with
    clean flags (validates the generator before error injection)."""
    w = PollWriter()
    w.frame(b"\x26", short=True)
    w.gap()
    hlta = b"\x50\x00" + crc_a(b"\x50\x00")
    w.frame(hlta)
    w.gap()
    sel = b"\x93\x20"
    w.frame(sel)
    polls = decode(w.build())
    assert [f.data for f in polls] == [b"\x26", hlta, sel]
    assert polls[0].has_flags(FrameFlags.ShortFrame)
    for f in polls:
        assert not f.has_flags(FrameFlags.ParityError)
        assert not f.has_flags(FrameFlags.CrcError)


def test_parity_error_flagged():
    """A flipped parity bit must flag ParityError on that frame (and only
    that frame), with the data still delivered."""
    w = PollWriter()
    w.frame(b"\x26", short=True)
    w.gap()
    w.frame(b"\x52\x77", flip_parity_at=1)
    w.gap()
    w.frame(b"\x26", short=True)
    polls = decode(w.build())
    assert len(polls) == 3
    bad = polls[1]
    assert bad.has_flags(FrameFlags.ParityError)
    assert not polls[0].has_flags(FrameFlags.ParityError)
    assert not polls[2].has_flags(FrameFlags.ParityError)


def test_crc_error_flagged():
    """A corrupted CRC_A on a CRC-carrying poll frame (HLTA) must flag
    CrcError; the same frame with the correct CRC must not."""
    good = b"\x50\x00" + crc_a(b"\x50\x00")
    bad = bytearray(good)
    bad[-1] ^= 0x01
    w = PollWriter()
    w.frame(good)
    w.gap()
    w.frame(bytes(bad))
    polls = decode(w.build())
    assert len(polls) == 2
    assert not polls[0].has_flags(FrameFlags.CrcError)
    assert polls[1].has_flags(FrameFlags.CrcError)
    assert polls[1].data == bytes(bad)


def test_select_with_uid_crc_roundtrip():
    """Full anticollision SELECT (93 70 + UID + BCC + CRC_A) decodes clean
    and keeps the payload byte-exact."""
    uid = bytes((0xDE, 0xAD, 0xBE, 0xEF))
    bcc = uid[0] ^ uid[1] ^ uid[2] ^ uid[3]
    body = b"\x93\x70" + uid + bytes((bcc,))
    frame = body + crc_a(body)
    w = PollWriter()
    w.frame(b"\x26", short=True)
    w.gap()
    w.frame(frame)
    polls = decode(w.build())
    assert polls[-1].data == frame
    assert not polls[-1].has_flags(FrameFlags.CrcError)
    assert not polls[-1].has_flags(FrameFlags.ParityError)


def test_python_fsm_agrees_on_adversarial_signals(monkeypatch):
    """The pure-Python walkers must produce the identical frames (flags
    included) for the error-injected waveforms — the native FSMs' live
    reference implementation covers the error paths too."""
    w = PollWriter()
    w.frame(b"\x26", short=True)
    w.gap()
    w.frame(b"\x52\x77", flip_parity_at=1)
    w.gap()
    bad = bytearray(b"\x50\x00" + crc_a(b"\x50\x00"))
    bad[-1] ^= 0x01
    w.frame(bytes(bad))
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
    assert any(f.has_flags(FrameFlags.ParityError) for f in pure)
    assert any(f.has_flags(FrameFlags.CrcError) for f in pure)


def test_decode_under_noise():
    """Detection sensitivity guard: well-formed frames keep decoding with
    moderate additive noise on the field (sigma = 6% of the carrier
    level); a sensitivity regression in the detect thresholds or
    conditioning chain fails this before any golden changes."""
    rng = np.random.default_rng(7)
    w = PollWriter()
    w.frame(b"\x26", short=True)
    w.gap()
    hlta = b"\x50\x00" + crc_a(b"\x50\x00")
    w.frame(hlta)
    sig = w.build()
    noisy = sig + rng.normal(0.0, 0.03, len(sig)).astype(np.float32)
    polls = decode(np.maximum(noisy, 0.0))
    assert [f.data for f in polls] == [b"\x26", hlta]
    for f in polls:
        assert not f.has_flags(FrameFlags.ParityError)
        assert not f.has_flags(FrameFlags.CrcError)
