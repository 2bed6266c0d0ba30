import numpy as np
import pytest

from nfclab.core.frame import Frame, FrameTech, FrameType
from nfclab.io.wav import read_wav, write_wav
from nfclab.io.golden import read_golden_frames, write_golden_frames


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.integers(-32768, 32768, 10000).astype(np.float32) / 32768.0).astype(
        np.float32
    )
    p = tmp_path / "t.wav"
    write_wav(str(p), x, 10_000_000)
    y, info = read_wav(str(p))
    assert info.sample_rate == 10_000_000
    assert info.channels == 1
    np.testing.assert_array_equal(x, y)


def test_wav_fixture_parse(fixture_dir):
    x, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    assert info.sample_rate == 10_000_000
    assert info.bits == 16
    assert len(x) == 114227
    # int16 scaling: sample values are k / 2^15
    assert np.all(np.abs(x) <= 1.0)


def test_golden_read(fixture_dir):
    frames = read_golden_frames(str(fixture_dir / "test_NFC-A_106kbps_001.json"))
    assert len(frames) == 10
    f = frames[0]
    assert f.tech_type == FrameTech.NfcATech
    assert f.frame_type == FrameType.NfcPollFrame
    assert f.data == b"\x52"
    assert f.sample_start == 10806 and f.sample_end == 11566


def test_golden_roundtrip(tmp_path, fixture_dir):
    src = str(fixture_dir / "test_NFC-A_106kbps_001.json")
    frames = read_golden_frames(src)
    out = tmp_path / "g.json"
    write_golden_frames(str(out), frames)
    again = read_golden_frames(str(out))
    assert frames == again


def test_frame_equality_semantics():
    a = Frame(tech_type=0x101, frame_type=0x102, frame_rate=105938, data=b"\x26")
    b = Frame(tech_type=0x101, frame_type=0x102, frame_rate=105938, data=b"\x26")
    # time fields excluded from equality (RawFrame.cpp:82-97)
    b.time_start = 123.0
    assert a == b
    b.sample_start = 1
    assert a != b
