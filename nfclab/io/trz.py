"""TRZ trace container (gzip'd tar with frame.json + APCM signal entries).

Parity with ``rt::Package`` (Package.cpp:22-123: microtar over gzip) and
``TraceStorageTask`` (TraceStorageTask.cpp):

- ``frame.json``: {"frames": [...]} with full frame metadata + hex payload
  (readFrameEntry :366-455, writeFrameEntry :458-525)
- ``logic-<id>.apcm`` / ``radio-<id>.apcm``: SampleHdr (magic "APCM",
  version 2, info[6] = [flags, startOffset, totalSamples, streamId,
  sampleRate, 0]) followed by delta-coded adaptive samples: logic = 2 bytes
  (u8 offset delta, u8 value), radio = 3 bytes (u8 offset delta, i16le sample
  delta scaled by 2^15) (:643-760 logic, :881-990 radio)
"""

from __future__ import annotations

import io
import json
import struct
import tarfile
from dataclasses import dataclass, field

import numpy as np

from ..core.frame import Frame

_HDR_FMT = "<4sI6I"
_HDR_SIZE = struct.calcsize(_HDR_FMT)

# info[] indices (TraceStorageTask.cpp:35-39)
INFO_FLAGS = 0
INFO_START_OFFSET = 1
INFO_TOTAL_SAMPLES = 2
INFO_STREAM_ID = 3
INFO_SAMPLE_RATE = 4


@dataclass
class SignalStream:
    """An adaptive (offset, value)-pair render stream for one channel."""

    stream_id: int
    sample_rate: int
    kind: str  # "logic" | "radio"
    offsets: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    values: np.ndarray = field(default_factory=lambda: np.empty(0, np.float32))
    start_offset: int = 0


def _frame_to_json(f: Frame) -> dict:
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
        e["frameData"] = f.hex_data
        e["length"] = len(f.data)
    return e


def _frame_from_json(e: dict) -> Frame:
    data = b""
    if "frameData" in e:
        data = bytes(int(tok, 16) for tok in e["frameData"].split(":"))
    return Frame(
        tech_type=e["techType"],
        frame_type=e["frameType"],
        frame_phase=e["framePhase"],
        frame_flags=e["frameFlags"],
        frame_rate=e["frameRate"],
        data=data,
        sample_start=e["sampleStart"],
        sample_end=e["sampleEnd"],
        sample_rate=e["sampleRate"],
        time_start=e["timeStart"],
        time_end=e["timeEnd"],
        date_time=e["dateTime"],
    )


def _shift_frame(f: Frame, start: int, rate_hint: int) -> Frame:
    rate = f.sample_rate or rate_hint
    dt = start / rate if rate else 0.0
    g = Frame(
        tech_type=f.tech_type,
        frame_type=f.frame_type,
        frame_phase=f.frame_phase,
        frame_flags=f.frame_flags,
        frame_rate=f.frame_rate,
        data=f.data,
        sample_start=f.sample_start - start,
        sample_end=f.sample_end - start,
        sample_rate=f.sample_rate,
        time_start=f.time_start - dt,
        time_end=f.time_end - dt,
        date_time=f.date_time,
    )
    return g


def write_trace(
    path: str,
    frames: list[Frame],
    signals: list[SignalStream] = (),
    sample_range: tuple[int, int] | None = None,
):
    """Write a TRZ trace (gzip tar, maximum compression like gzopen "wb9").

    sample_range=(start, end): save only that sample span, with frames and
    signal offsets shifted so the range starts at sample 0 (the reference's
    time-range save, TraceStorageTask.cpp:322-363 writeTraceFile filter +
    writeFrameEntry range shift :460-520)."""
    if sample_range is not None:
        start, end = sample_range
        rate_hint = next(
            (f.sample_rate for f in frames if f.sample_rate), 0
        )
        frames = [
            _shift_frame(f, start, rate_hint)
            for f in frames
            if start <= f.sample_start and f.sample_end <= end
        ]
        clipped = []
        for s in signals:
            sel = (s.offsets >= start) & (s.offsets <= end)
            offs = s.offsets[sel] - start
            # anchor the delta coding at the first kept point (the gap from
            # the range start may exceed the u8 offset-delta budget)
            anchor = int(offs[0]) if len(offs) else 0
            clipped.append(
                SignalStream(
                    s.stream_id,
                    s.sample_rate,
                    s.kind,
                    offs,
                    s.values[sel],
                    anchor,
                )
            )
        signals = clipped
    with tarfile.open(path, "w:gz", compresslevel=9) as tar:

        def add(name: str, payload: bytes):
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))

        content = json.dumps({"frames": [_frame_to_json(f) for f in frames]})
        add("frame.json", content.encode())

        for s in signals:
            hdr = struct.pack(
                _HDR_FMT,
                b"APCM",
                2,
                0,
                int(s.start_offset),
                len(s.offsets),
                s.stream_id,
                s.sample_rate,
                0,
            )
            out = bytearray(hdr)
            last_offset = int(s.start_offset)
            if s.kind == "logic":
                for off, val in zip(s.offsets, s.values):
                    out.append((int(off) - last_offset) & 0xFF)
                    out.append(1 if val > 0.5 else 0)
                    last_offset = int(off)
                add(f"logic-{s.stream_id}.apcm", bytes(out))
            else:
                last_sample = 0
                for off, val in zip(s.offsets, s.values):
                    sample = int(np.int16(np.float32(val) * np.float32(1 << 15)))
                    d = sample - last_sample
                    out.append((int(off) - last_offset) & 0xFF)
                    out.append(d & 0xFF)
                    out.append((d >> 8) & 0xFF)
                    last_offset = int(off)
                    last_sample = sample
                add(f"radio-{s.stream_id}.apcm", bytes(out))


def read_trace(path: str) -> tuple[list[Frame], list[SignalStream]]:
    """Read a TRZ trace; returns (frames, signal streams) with absolute
    offsets and float values reconstructed from the delta coding."""
    frames: list[Frame] = []
    signals: list[SignalStream] = []
    with tarfile.open(path, "r:gz") as tar:
        for member in tar.getmembers():
            payload = tar.extractfile(member).read()
            if member.name.startswith("frame"):
                info = json.loads(payload)
                frames.extend(_frame_from_json(e) for e in info.get("frames", []))
            elif member.name.startswith(("logic", "radio")):
                kind = "logic" if member.name.startswith("logic") else "radio"
                magic, version, *info = struct.unpack(
                    _HDR_FMT, payload[:_HDR_SIZE]
                )
                if magic != b"APCM":
                    raise ValueError(f"{member.name}: bad APCM magic")
                start = info[INFO_START_OFFSET]
                count = info[INFO_TOTAL_SAMPLES]
                sid = info[INFO_STREAM_ID] if version >= 2 else 0
                rate = info[INFO_SAMPLE_RATE] if version >= 2 else 0
                body = payload[_HDR_SIZE:]
                offsets = np.empty(count, np.int64)
                values = np.empty(count, np.float32)
                pos = start
                if kind == "logic":
                    raw = np.frombuffer(body[: count * 2], np.uint8).reshape(-1, 2)
                    offsets[:] = start + np.cumsum(raw[:, 0].astype(np.int64))
                    values[:] = raw[:, 1].astype(np.float32)
                else:
                    raw = np.frombuffer(body[: count * 3], np.uint8).reshape(-1, 3)
                    offsets[:] = start + np.cumsum(raw[:, 0].astype(np.int64))
                    deltas = (
                        raw[:, 1].astype(np.int16)
                        | (raw[:, 2].astype(np.int16) << 8)
                    ).astype(np.int16)
                    # the reference reader accumulates in a C `short`
                    # (TraceStorageTask.cpp:853: sample += delta), so a
                    # delta that overflowed i16 at write time wraps back
                    # mod 2^16 — accumulate i64 then wrap to i16
                    values[:] = (
                        np.cumsum(deltas.astype(np.int64))
                        .astype(np.int16)
                        .astype(np.float32)
                    ) / np.float32(1 << 15)
                signals.append(
                    SignalStream(sid, rate, kind, offsets, values, start)
                )
    return frames, signals
