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


def _decode_all(sig):
    frames = NfcDecoder(
        enable_nfca=False, enable_nfcb=False, enable_nfcf=False
    ).decode(np.asarray(sig, np.float32), RATE)
    return [
        f for f in frames
        if f.frame_type in (int(FrameType.NfcPollFrame),
                            int(FrameType.NfcListenFrame))
    ]


INVENTORY = b"\x26\x01\x00" + crc_b(b"\x26\x01\x00")
UID_BODY = bytes.fromhex("000003dda3b1140104e0")
UID_RESP = UID_BODY + crc_b(UID_BODY)


def test_listen_roundtrip_inventory():
    """INVENTORY poll + single-subcarrier UID response decode byte-exact
    (structure measured from the bundled capture; CRC matches its bytes).
    The bundled V fixtures carry only well-formed listen frames."""
    from nfcv_synth import VListenWriter

    w = VListenWriter()
    w.frame(INVENTORY)
    w.listen_frame(UID_RESP)
    frames = _decode_all(w.build())
    assert [(f.frame_type, f.data) for f in frames] == [
        (int(FrameType.NfcPollFrame), INVENTORY),
        (int(FrameType.NfcListenFrame), UID_RESP),
    ]
    for f in frames:
        assert f.frame_rate == 26484
        assert not f.has_flags(FrameFlags.CrcError)


def test_listen_crc_error_flagged():
    from nfcv_synth import VListenWriter

    bad = bytearray(UID_RESP)
    bad[-1] ^= 0x20
    w = VListenWriter()
    w.frame(INVENTORY)
    w.listen_frame(bytes(bad))
    frames = _decode_all(w.build())
    assert len(frames) == 2
    assert frames[1].data == bytes(bad)
    assert frames[1].has_flags(FrameFlags.CrcError)
    assert not frames[0].has_flags(FrameFlags.CrcError)


def test_python_fsm_agrees_on_v_listen_signals(monkeypatch):
    """Pure-Python NfcV walker produces identical listen frames (flags
    included) for the error-injected response."""
    from nfcv_synth import VListenWriter

    bad = bytearray(UID_RESP)
    bad[-1] ^= 0x20
    w = VListenWriter()
    w.frame(INVENTORY)
    w.listen_frame(bytes(bad))
    w.gap()
    w.frame(INVENTORY)
    w.listen_frame(UID_RESP)
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
    assert not pure[3].has_flags(FrameFlags.CrcError)
