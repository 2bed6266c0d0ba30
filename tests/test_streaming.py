"""Incremental streaming decoder: chunked feeds match one-shot decode."""

import numpy as np
import pytest

from nfclab.io.golden import GOLDEN_TYPES, read_golden_frames
from nfclab.io.wav import read_wav
from nfclab.runtime.streaming import StreamingNfcDecoder


@pytest.mark.parametrize("block", [65536, 17001])
def test_streaming_matches_golden(fixture_dir, block):
    wav = str(fixture_dir / "test_NFC-A_106kbps_001.wav")
    samples, info = read_wav(wav)
    dec = StreamingNfcDecoder(info.sample_rate)
    frames = []
    for off in range(0, len(samples), block):
        frames.extend(dec.feed(samples[off : off + block]))
    frames.extend(dec.finish())
    got = [f for f in frames if f.frame_type in GOLDEN_TYPES]
    want = read_golden_frames(str(fixture_dir / "test_NFC-A_106kbps_001.json"))
    assert got == want
    # final flush emits a carrier-state frame (NfcDecoder.cpp:448-463)
    assert frames[-1].frame_type in (0x100, 0x101)


def test_streaming_incremental_emission(fixture_dir):
    """Frames appear as soon as their symbols land, not only at EOF."""
    wav = str(fixture_dir / "test_NFC-A_106kbps_001.wav")
    samples, info = read_wav(wav)
    dec = StreamingNfcDecoder(info.sample_rate)
    counts = []
    block = 16384
    for off in range(0, len(samples), block):
        got = dec.feed(samples[off : off + block])
        counts.append(len([f for f in got if f.frame_type in GOLDEN_TYPES]))
    dec.finish()
    # decoded frames spread over multiple feeds
    assert sum(1 for c in counts if c > 0) >= 3


def test_streaming_multi_tech(fixture_dir):
    wav = str(fixture_dir / "test_POLL_AB_001.wav")
    samples, info = read_wav(wav)
    dec = StreamingNfcDecoder(info.sample_rate)
    frames = []
    for off in range(0, len(samples), 50000):
        frames.extend(dec.feed(samples[off : off + 50000]))
    frames.extend(dec.finish())
    got = [f for f in frames if f.frame_type in GOLDEN_TYPES]
    want = read_golden_frames(str(fixture_dir / "test_POLL_AB_001.json"))
    assert got == want
