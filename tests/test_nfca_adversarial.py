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


def _listen_frames(sig):
    frames = NfcDecoder(
        enable_nfcb=False, enable_nfcf=False, enable_nfcv=False
    ).decode(np.asarray(sig, np.float32), RATE)
    return [
        f for f in frames
        if f.frame_type in (int(FrameType.NfcPollFrame),
                            int(FrameType.NfcListenFrame))
    ]


def test_listen_ask_roundtrip_and_parity():
    """Synthesized tag responses (848 kHz load-modulation subcarrier,
    Manchester halves): ATQA round-trips clean; a flipped parity bit in
    the response flags ParityError on the LISTEN frame."""
    from nfca_synth import ListenWriter

    w = ListenWriter()
    w.frame(b"\x26", short=True)
    w.listen_frame(b"\x04\x00", delay=800)
    got = _listen_frames(w.build())
    assert [f.data for f in got] == [b"\x26", b"\x04\x00"]
    assert got[1].frame_type == int(FrameType.NfcListenFrame)
    assert not got[1].has_flags(FrameFlags.ParityError)

    w = ListenWriter()
    w.frame(b"\x26", short=True)
    w.listen_frame(b"\x04\x00", delay=800, flip_parity_at=1)
    got = _listen_frames(w.build())
    assert got[1].data == b"\x04\x00"
    assert got[1].has_flags(FrameFlags.ParityError)


def test_full_anticollision_exchange():
    """Complete selection dialogue — REQA -> ATQA -> SEL -> UID+BCC ->
    SELECT+CRC -> SAK — decodes poll and listen frames byte-exact with
    the selection phase tagged throughout (the bundled fixtures cover
    this only as opaque goldens; here every byte is constructed)."""
    from nfca_synth import ListenWriter

    uid = bytes((0xDE, 0xAD, 0xBE, 0xEF))
    bcc = 0
    for b in uid:
        bcc ^= b
    sel_poll = b"\x93\x70" + uid + bytes((bcc,))
    sak = b"\x08" + crc_a(b"\x08")

    w = ListenWriter()
    w.frame(b"\x26", short=True)
    w.listen_frame(b"\x04\x00", delay=800)
    w.gap(8000)
    w.frame(b"\x93\x20")
    w.listen_frame(uid + bytes((bcc,)), delay=800)
    w.gap(8000)
    w.frame(sel_poll + crc_a(sel_poll))
    w.listen_frame(sak, delay=800)

    got = _listen_frames(w.build())
    assert [f.data for f in got] == [
        b"\x26", b"\x04\x00", b"\x93\x20", uid + bytes((bcc,)),
        sel_poll + crc_a(sel_poll), sak,
    ]
    types = [f.frame_type for f in got]
    assert types == [0x102, 0x103, 0x102, 0x103, 0x102, 0x103]
    from nfclab.core.frame import FramePhase

    assert all(
        f.frame_phase == int(FramePhase.NfcSelectionPhase) for f in got
    )
    assert not any(
        f.has_flags(FrameFlags.ParityError) or f.has_flags(FrameFlags.CrcError)
        for f in got
    )
