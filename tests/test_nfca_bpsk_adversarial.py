"""Adversarial NFC-A 424 kbps BPSK listen decoding over synthesized
waveforms — round-trip validation, parity/CRC error flagging, and
malformed-tail handling (NfcA.cpp:690-803, 1220-1424).  No bundled fixture
carries an errored BPSK frame."""

import numpy as np
import pytest

from nfca_bpsk_synth import A424Writer

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
    return [
        f for f in frames
        if f.frame_type in (int(FrameType.NfcPollFrame),
                            int(FrameType.NfcListenFrame))
    ]


def crc_a(data: bytes) -> bytes:
    from nfclab.protocol.crc import crc16_ccitt

    v = crc16_ccitt(data, 0, len(data), 0x6363, True)
    return bytes((v & 0xFF, (v >> 8) & 0xFF))


def _iblock(pcb: int, body: bytes) -> bytes:
    d = bytes((pcb,)) + body
    return d + crc_a(d)


def test_synth_roundtrip_iblock_exchange():
    """An ISO-DEP I-block poll + BPSK I-block response decode byte-exact at
    423750 Hz with no error flags (the happy path the 424k fixtures cover,
    re-derived from first principles to validate the synthesizer)."""
    poll = _iblock(0x0A, bytes.fromhex("00a40400"))
    resp = _iblock(0x0A, bytes.fromhex("6e00"))
    w = A424Writer()
    w.frame(poll)
    w.listen_frame(resp, delay=900)
    frames = decode(w.build())
    assert [(f.frame_type, f.data) for f in frames] == [
        (int(FrameType.NfcPollFrame), poll),
        (int(FrameType.NfcListenFrame), resp),
    ]
    for f in frames:
        assert f.frame_rate == 423750
        assert not f.has_flags(FrameFlags.ParityError)
        assert not f.has_flags(FrameFlags.CrcError)


def test_listen_parity_error_flagged():
    """A flipped parity bit in a middle byte yields the same bytes with
    ParityError set (NfcA.cpp:757-767 stores the byte and flags)."""
    poll = _iblock(0x0A, bytes.fromhex("00a40400"))
    resp = _iblock(0x0A, bytes.fromhex("6e00"))
    w = A424Writer()
    w.frame(poll)
    w.listen_frame(resp, delay=900, flip_parity_at=1)
    frames = decode(w.build())
    assert len(frames) == 2
    listen = frames[1]
    assert listen.frame_type == int(FrameType.NfcListenFrame)
    assert listen.data == resp
    assert listen.has_flags(FrameFlags.ParityError)


def test_listen_last_byte_even_parity():
    """The final BPSK byte carries EVEN parity; flipping it (i.e. sending
    odd like the other bytes) must flag ParityError (NfcA.cpp:728-735)."""
    poll = _iblock(0x0A, bytes.fromhex("00a40400"))
    resp = _iblock(0x0A, bytes.fromhex("6e00"))
    w = A424Writer()
    w.frame(poll)
    w.listen_frame(resp, delay=900, flip_parity_at=len(resp) - 1)
    frames = decode(w.build())
    assert len(frames) == 2
    assert frames[1].data == resp
    assert frames[1].has_flags(FrameFlags.ParityError)


def test_listen_crc_error_flagged():
    """Corrupting a CRC byte (but keeping parity valid) flags CrcError at
    the protocol layer while the payload round-trips."""
    poll = _iblock(0x0A, bytes.fromhex("00a40400"))
    resp = bytearray(_iblock(0x0A, bytes.fromhex("6e00")))
    resp[-1] ^= 0x24
    w = A424Writer()
    w.frame(poll)
    w.listen_frame(bytes(resp), delay=900)
    frames = decode(w.build())
    assert len(frames) == 2
    assert frames[1].data == bytes(resp)
    assert frames[1].has_flags(FrameFlags.CrcError)
    assert not frames[1].has_flags(FrameFlags.ParityError)


def test_listen_trailing_bits_tolerated():
    """Extra toggle bits after the last parity (malformed tail) must not
    corrupt the decoded bytes: the partial byte is dropped at EOF unless a
    full 9 bits accumulated (NfcA.cpp:724-741 keeps bytes>0 frames)."""
    poll = _iblock(0x0A, bytes.fromhex("00a40400"))
    resp = _iblock(0x0A, bytes.fromhex("6e00"))
    w = A424Writer()
    w.frame(poll)
    w.listen_frame(resp, delay=900, trailing_bits=3)
    frames = decode(w.build())
    assert len(frames) == 2
    assert frames[1].data == resp


def test_212kbps_roundtrip_and_parity():
    """The same BPSK structure at rateType 1 (211875 Hz) — NO bundled
    fixture covers NFC-A 212 kbps at all, so this is the only exercise of
    that poll correlator + BPSK bitrate pair."""
    poll = _iblock(0x0A, bytes.fromhex("00a40400"))
    resp = _iblock(0x0A, bytes.fromhex("6e00"))
    w = A424Writer(rate_type=1)
    w.frame(poll)
    w.listen_frame(resp, delay=900)
    w.gap()
    w.frame(poll)
    w.listen_frame(resp, delay=900, flip_parity_at=1)
    frames = decode(w.build())
    assert [f.data for f in frames] == [poll, resp, poll, resp]
    assert all(f.frame_rate == 211875 for f in frames)
    assert not frames[1].has_flags(FrameFlags.ParityError)
    assert frames[3].has_flags(FrameFlags.ParityError)


def test_python_fsm_agrees_on_bpsk_signals(monkeypatch):
    """The pure-Python BPSK walker must produce identical frames (flags
    included) for the error-injected waveforms — it is the live reference
    implementation of the native decode_a.cpp BPSK FSM."""
    poll = _iblock(0x0A, bytes.fromhex("00a40400"))
    resp = _iblock(0x0A, bytes.fromhex("6e00"))
    w = A424Writer()
    w.frame(poll)
    w.listen_frame(resp, delay=900, flip_parity_at=1)
    w.gap()
    w.frame(poll)
    w.listen_frame(resp, delay=900, trailing_bits=3)
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
    assert len(pure) == 4
    assert pure[1].has_flags(FrameFlags.ParityError)


def test_multiple_exchanges_and_delay_window():
    """Back-to-back poll/listen exchanges decode independently across the
    FGT..FWT response window."""
    seq = []
    w = A424Writer()
    for i, delay in enumerate((850, 900, 1000)):
        poll = _iblock(0x0A | (i & 1), bytes((0xB0, i)))
        resp = _iblock(0x0A | (i & 1), bytes((0x90, 0x00 + i)))
        w.frame(poll)
        w.listen_frame(resp, delay=delay)
        w.gap()
        seq += [poll, resp]
    frames = decode(w.build())
    assert [f.data for f in frames] == seq
