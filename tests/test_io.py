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


def test_trz_sample_header_matches_reference_struct_layout(tmp_path):
    """Byte-level pin of the APCM SampleHdr against the reference's C
    struct (TraceStorageTask.cpp:55-60: char magic[4]; uint32 version;
    uint32 info[6] — little-endian x86, no padding, 32 bytes), so a trace
    written here parses in the reference implementation and vice versa."""
    import io as _io
    import struct
    import tarfile

    import numpy as np

    from nfclab.io.trz import (
        INFO_SAMPLE_RATE,
        INFO_START_OFFSET,
        INFO_STREAM_ID,
        INFO_TOTAL_SAMPLES,
        SignalStream,
        read_trace,
        write_trace,
    )

    offsets = np.array([100, 150, 220], np.int64)
    values = np.array([1.0, 0.0, 1.0], np.float32)
    s = SignalStream(3, 10_000_000, "logic", offsets, values, 100)
    path = tmp_path / "t.trz"
    write_trace(str(path), [], [s])

    with tarfile.open(path, "r:gz") as tar:
        names = tar.getnames()
        entry = [n for n in names if n.endswith(".apcm")][0]
        raw = tar.extractfile(entry).read()

    # exactly the reference struct: 4s magic + u32 version + 6 u32 info
    assert len(raw) >= 32
    magic, version = struct.unpack_from("<4sI", raw, 0)
    info = struct.unpack_from("<6I", raw, 8)
    assert magic == b"APCM"
    assert version == 2
    assert info[INFO_START_OFFSET] == 100
    assert info[INFO_TOTAL_SAMPLES] == 3
    assert info[INFO_STREAM_ID] == 3
    assert info[INFO_SAMPLE_RATE] == 10_000_000
    # logic payload: 2 bytes per sample (u8 offset delta, u8 value)
    assert len(raw) == 32 + 2 * 3

    # and a hand-built reference-layout entry parses back identically
    hand = struct.pack(
        "<4sI6I", b"APCM", 2, 0, 100, 3, 3, 10_000_000, 0
    ) + bytes([0, 1, 50, 0, 70, 1])
    buf = _io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        ti = tarfile.TarInfo("logic-3.apcm")
        ti.size = len(hand)
        tar.addfile(ti, _io.BytesIO(hand))
        ti = tarfile.TarInfo("frame.json")
        payload = b'{"frames": []}'
        ti.size = len(payload)
        tar.addfile(ti, _io.BytesIO(payload))
    (tmp_path / "ref.trz").write_bytes(buf.getvalue())
    frames, streams = read_trace(str(tmp_path / "ref.trz"))
    assert not frames and len(streams) == 1
    r = streams[0]
    assert r.stream_id == 3 and r.sample_rate == 10_000_000
    np.testing.assert_array_equal(r.offsets, offsets)
    np.testing.assert_array_equal(r.values, values)
