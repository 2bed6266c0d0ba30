"""Edge-case robustness: degenerate inputs must not crash any decoder path."""

import numpy as np
import pytest

from nfclab.runtime.decoder import NfcDecoder
from nfclab.runtime.streaming import StreamingNfcDecoder

RATE = 10_000_000


def test_decode_pure_noise():
    rng = np.random.default_rng(7)
    noise = (rng.random(400_000, dtype=np.float32) * 0.8).astype(np.float32)
    frames = NfcDecoder().decode(noise, RATE)
    # carrier events at most; no crash and no bogus long frames
    assert all(len(f.data) < 64 for f in frames)


def test_decode_all_silence():
    frames = NfcDecoder().decode(np.zeros(200_000, np.float32), RATE)
    assert all(not f.data for f in frames)


def test_decode_tiny_input():
    # shorter than the warm-up ring
    frames = NfcDecoder().decode(np.full(100, 0.3, np.float32), RATE)
    assert isinstance(frames, list)


def test_streaming_tiny_feeds(fixture_dir):
    """Pathological feed sizes (1..4097 samples) still decode exactly."""
    from nfclab.io.golden import GOLDEN_TYPES, read_golden_frames
    from nfclab.io.wav import read_wav

    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    dec = StreamingNfcDecoder(info.sample_rate)
    frames = []
    sizes = [1, 17, 4097, 65536]
    off = 0
    i = 0
    while off < len(samples):
        m = sizes[i % len(sizes)]
        frames.extend(dec.feed(samples[off : off + m]))
        off += m
        i += 1
    frames.extend(dec.finish())
    got = [f for f in frames if f.frame_type in GOLDEN_TYPES]
    want = read_golden_frames(str(fixture_dir / "test_NFC-A_106kbps_001.json"))
    assert got == want


def test_streaming_empty_feed():
    dec = StreamingNfcDecoder(RATE)
    assert dec.feed(np.empty(0, np.float32)) == []
    assert dec.feed(np.full(70_000, 0.3, np.float32)) is not None


def test_decoder_rejects_bad_shapes():
    from nfclab.runtime.logic_decoder import IsoDecoder

    with pytest.raises(ValueError):
        IsoDecoder().decode(np.zeros((100, 2), np.float32), RATE)
