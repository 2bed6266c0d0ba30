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


def test_trz_interop_reference_written_file(tmp_path, fixture_dir):
    """Read a TRZ authored by the REFERENCE storage stack: the oracle
    binary (tests/trz_oracle/) links the reference's real rt::Package
    (Package.cpp: microtar over gzip) + vendored microtar + nlohmann json
    and writes frame.json / logic-N.apcm / radio-N.apcm with the exact
    TraceStorageTask byte semantics (writeFrameEntry :458-525,
    writeLogicEntry :643-760, writeRadioEntry :881-990).  io/trz.py must
    read the container and every entry back losslessly."""
    import json
    import shutil
    import subprocess
    from pathlib import Path

    import numpy as np

    from nfclab.io.golden import read_golden_frames
    from nfclab.io.trz import read_trace

    ref = Path("/root/reference/src/nfc-lib")
    if not ref.exists() or shutil.which("g++") is None:
        pytest.skip("reference sources or g++ unavailable")

    oracle_dir = Path(__file__).parent / "trz_oracle"
    exe = tmp_path / "trz_oracle"
    subprocess.run(
        [
            "g++", "-O1", "-std=c++17", "-o", str(exe),
            str(oracle_dir / "main.cpp"),
            str(oracle_dir / "stub_logger.cpp"),
            str(ref / "lib-rt/rt-lang/src/main/cpp/Package.cpp"),
            "-I", str(ref / "lib-rt/rt-lang/src/main/include"),
            "-I", str(ref / "lib-ext/microtar/src/main/c"),
            "-I", str(ref / "lib-ext/nlohmann/src/main/cpp"),
            "-x", "c", str(ref / "lib-ext/microtar/src/main/c/microtar.c"),
            "-x", "none", "-lz",
        ],
        check=True, capture_output=True,
    )

    # frames: a real golden decode's frame set, shaped exactly like
    # writeFrameEntry's json entries
    want_frames = read_golden_frames(
        str(fixture_dir / "test_NFC-A_106kbps_001.json")
    )
    entries = []
    for f in want_frames:
        e = {
            "sampleStart": int(f.sample_start),
            "sampleEnd": int(f.sample_end),
            "sampleRate": int(f.sample_rate),
            "timeStart": f.time_start,
            "timeEnd": f.time_end,
            "techType": int(f.tech_type),
            "frameType": int(f.frame_type),
            "frameRate": int(f.frame_rate),
            "frameFlags": int(f.frame_flags),
            "framePhase": int(f.frame_phase),
            "dateTime": f.date_time,
        }
        if f.data:
            e["frameData"] = ":".join(f"{b:02X}" for b in f.data)
            e["length"] = len(f.data)
        entries.append(e)

    rng = np.random.default_rng(7)
    r_off = np.cumsum(rng.integers(1, 200, 64)).astype(np.int64)
    r_val = (rng.random(64) * 1.6 - 0.8).astype(np.float32)
    l_off = np.cumsum(rng.integers(1, 250, 48)).astype(np.int64)
    l_val = rng.integers(0, 2, 48).astype(np.float32)
    spec = {
        "frames": entries,
        "radio": [{
            "id": 0, "sampleRate": 10_000_000,
            "offsets": r_off.tolist(), "values": r_val.tolist(),
        }],
        "logic": [{
            "id": 2, "sampleRate": 10_000_000,
            "offsets": l_off.tolist(), "values": l_val.tolist(),
        }],
    }
    (tmp_path / "in.json").write_text(json.dumps(spec))
    out = tmp_path / "ref_authored.trz"
    subprocess.run(
        [str(exe), str(tmp_path / "in.json"), str(out)],
        check=True, capture_output=True,
    )

    frames, streams = read_trace(str(out))
    assert frames == want_frames

    by_kind = {s.kind: s for s in streams}
    assert set(by_kind) == {"radio", "logic"}
    r = by_kind["radio"]
    assert r.stream_id == 0 and r.sample_rate == 10_000_000
    np.testing.assert_array_equal(r.offsets, r_off)
    # radio values survive through the reference's int16 quantization
    # (delta coding wraps mod 2^16 exactly like the reference's `short`
    # accumulator, TraceStorageTask.cpp:853)
    want_q = (r_val * 32768).astype(np.int16).astype(np.float32) / np.float32(
        1 << 15
    )
    np.testing.assert_allclose(r.values, want_q, atol=1e-6)
    l = by_kind["logic"]
    assert l.stream_id == 2 and l.sample_rate == 10_000_000
    np.testing.assert_array_equal(l.offsets, l_off)
    np.testing.assert_array_equal(l.values, l_val)
