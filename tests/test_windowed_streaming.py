"""Windowed streaming: bounded-memory live decode matches unbounded decode.

All FSM state stays in absolute stream clocks; the decoder keeps only the
trailing window of every dense array and native kernels address it through
virtual pointers.  These tests force real window compactions on the golden
fixtures and assert byte+sample-exact frame equality.
"""

import numpy as np
import pytest

from nfclab.io.golden import GOLDEN_TYPES, read_golden_frames
from nfclab.io.wav import read_wav
from nfclab.runtime.streaming import StreamingNfcDecoder


def _native_ok():
    from nfclab.native.binding import native_available

    return native_available()


pytestmark = pytest.mark.skipif(
    not _native_ok(), reason="windowed streaming requires the native library"
)


def _stream(samples, rate, window, block=65536, slack=2):
    # slack=2 forces compactions on the short golden fixtures (the
    # production default of 4 keeps more history to amortize memmoves)
    dec = StreamingNfcDecoder(rate, window=window, slack=slack)
    frames = []
    for off in range(0, len(samples), block):
        frames.extend(dec.feed(samples[off : off + block]))
    frames.extend(dec.finish())
    return dec, frames


@pytest.mark.parametrize(
    "name,window",
    [
        ("test_POLL_ABF_001", 1 << 18),
        ("test_NFC-V_26kbps_001", 1 << 18),
    ],
)
def test_windowed_matches_golden(fixture_dir, name, window):
    samples, info = read_wav(str(fixture_dir / f"{name}.wav"))
    dec, frames = _stream(samples, info.sample_rate, window)
    assert dec.base > 0, "window never compacted; test is vacuous"
    got = [f for f in frames if f.frame_type in GOLDEN_TYPES]
    want = read_golden_frames(str(fixture_dir / f"{name}.json"))
    assert got == want


def test_windowed_bpsk_across_compactions(fixture_dir):
    """BPSK listen decode (running product integrators) stays exact across
    window shifts — tiled 424 kbps capture, windowed vs unbounded.  Runs at
    the production default slack to cover that compaction cadence too."""
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_424kbps_001.wav"))
    big = np.tile(samples, 8)
    dec_w, frames_w = _stream(big, info.sample_rate, 1 << 17, slack=4)
    dec_u, frames_u = _stream(big, info.sample_rate, None)
    assert dec_w.base > 0
    got_w = [f for f in frames_w if f.frame_type in GOLDEN_TYPES]
    got_u = [f for f in frames_u if f.frame_type in GOLDEN_TYPES]
    assert got_w == got_u
    assert len(got_w) == 8 * len(
        read_golden_frames(str(fixture_dir / "test_NFC-A_424kbps_001.json"))
    )


def test_windowed_long_stream_bounded_memory(fixture_dir):
    """A multi-window tiled stream decodes identically to the unbounded
    decoder while the physical buffers stay <= 2x window."""
    samples, info = read_wav(str(fixture_dir / "test_POLL_AB_001.wav"))
    big = np.tile(samples, 6)
    W = 1 << 19

    dec_w, frames_w = _stream(big, info.sample_rate, W)
    dec_u, frames_u = _stream(big, info.sample_rate, None)

    assert dec_w.base > W  # several compactions
    assert len(dec_w._bufs["value"]) <= 2 * W + (1 << 17)
    got_w = [f for f in frames_w if f.frame_type in GOLDEN_TYPES]
    got_u = [f for f in frames_u if f.frame_type in GOLDEN_TYPES]
    assert got_w == got_u
    assert len(got_w) == 6 * len(
        read_golden_frames(str(fixture_dir / "test_POLL_AB_001.json"))
    )


def test_windowed_stale_channel_restart(fixture_dir):
    """A long idle gap (no locks, so decode channels go stale across many
    window shifts) followed by traffic: derived channels must restart inside
    the window and decode the late frames exactly."""
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    # capture, ~3.3M samples of carrier-level idle (several windows), capture
    idle = np.full(3_300_000, np.float32(samples[0]))
    big = np.concatenate([samples, idle, samples])
    W = 1 << 18

    dec_w, frames_w = _stream(big, info.sample_rate, W)
    dec_u, frames_u = _stream(big, info.sample_rate, None)

    assert dec_w.base > 2 * W  # the idle stretch really crossed windows
    got_w = [f for f in frames_w if f.frame_type in GOLDEN_TYPES]
    got_u = [f for f in frames_u if f.frame_type in GOLDEN_TYPES]
    assert got_w == got_u
    # both halves decoded (2x the fixture's golden frame count)
    want = read_golden_frames(str(fixture_dir / "test_NFC-A_106kbps_001.json"))
    assert len(got_w) == 2 * len(want)


def test_fused_extend_matches_lazy(fixture_dir, monkeypatch):
    """The fused per-feed extension (extend_all -> one nfclab_feed_ext call)
    must leave every channel entry bit-identical to the lazy per-entry
    extenders, across irregular feed sizes and window compactions."""
    from nfclab.dsp.channels import LazyChannels

    samples, info = read_wav(str(fixture_dir / "test_POLL_AB_001.wav"))
    big = np.tile(samples, 3)
    W = 1 << 18
    rng = np.random.default_rng(7)
    cuts = np.sort(rng.choice(np.arange(1, len(big)), 40, replace=False))
    blocks = np.split(big, cuts)

    def run(fused):
        if not fused:
            # force the no-native fallback branch of extend_all (per-entry
            # lazy extenders), keeping everything else identical
            monkeypatch.setattr(
                LazyChannels,
                "extend_all",
                lambda self: [
                    ent["extend"]()
                    for ent in list(self._cache.values())
                    if isinstance(ent, dict) and ent.get("extend") is not None
                ],
            )
        dec = StreamingNfcDecoder(info.sample_rate, window=W, slack=2)
        frames = []
        for blk in blocks:
            frames.extend(dec.feed(blk))
        frames.extend(dec.finish())
        if not fused:
            monkeypatch.undo()
        chans = {}
        ch = dec._ctx.channels
        for key, ent in ch._cache.items():
            if not isinstance(ent, dict) or ent.get("extend") is None:
                continue
            if ent.get("kind") == "idx":
                chans[key] = ent["idx"][: ent["idx_n"]].copy()
            else:
                chans[key] = ent["arr"][: ent["n"] - ch.base].copy()
        return frames, chans, dec.base

    frames_f, chans_f, base_f = run(fused=True)
    frames_l, chans_l, base_l = run(fused=False)

    assert base_f == base_l and base_f > 0  # compactions happened
    assert frames_f == frames_l
    assert set(chans_f) == set(chans_l)
    for key in chans_f:
        assert np.array_equal(chans_f[key], chans_l[key]), key


def test_windowed_matches_batch_on_adversarial_errors():
    """Windowed streaming must reproduce the BATCH decode exactly on
    error-injected waveforms (flags included) — error-path state must
    survive window compaction, not just the fixtures' happy paths."""
    from nfca_bpsk_synth import A424Writer
    from nfca_synth import PollWriter, crc_a
    from nfcb_synth import BListenWriter, crc_b

    from nfclab.runtime.decoder import NfcDecoder
    from nfclab.runtime.streaming import StreamingNfcDecoder

    # A: parity-flipped poll; A BPSK: parity + trailing bits; B: bad stop
    wa = PollWriter()
    wa.frame(b"\x52\x77", flip_parity_at=1)
    wa.gap()
    bad = bytearray(b"\x50\x00" + crc_a(b"\x50\x00"))
    bad[-1] ^= 0x01
    wa.frame(bytes(bad))

    wb = A424Writer()
    body = b"\x0a\x00" + crc_a(b"\x0a\x00")
    wb.frame(body)
    wb.listen_frame(body, delay=900, flip_parity_at=1)

    wc = BListenWriter()
    reqb = b"\x05\x00\x00" + crc_b(b"\x05\x00\x00")
    wc.frame(reqb)
    # bad stop on a NONZERO byte: a zero byte with a 0 stop bit is
    # indistinguishable from the B EOF character (clean end, no error)
    wc.listen_frame(reqb, delay=2000, bad_stop_at=3)

    sig = np.concatenate([
        wa.build(), wb.build(), wc.build(),
        np.full(200_000, np.float32(0.5)),
    ])

    from nfclab.core.frame import FrameType

    batch = NfcDecoder().decode(sig, 10_000_000)

    stream = StreamingNfcDecoder(10_000_000, window=1 << 20)
    got = []
    for off in range(0, len(sig), 40_000):
        got.extend(stream.feed(sig[off : off + 40_000]))
    got.extend(stream.finish())
    # the live path ends with a carrier-status frame at EOF (reference
    # NfcDecoder.cpp invalid-buffer branch, which the offline test-sdr
    # loop never reaches — batch matches test-sdr, streaming the task)
    assert got[-1].frame_type == int(FrameType.NfcCarrierOn)
    assert got[-1].sample_start == len(sig) - 1
    assert got[:-1] == batch
    from nfclab.core.frame import FrameFlags

    assert any(f.has_flags(FrameFlags.ParityError) for f in got)
    assert any(f.has_flags(FrameFlags.Truncated) for f in got)
