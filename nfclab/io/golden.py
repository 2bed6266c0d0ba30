"""Golden frame JSON storage.

Parity with the reference regression harness's frame schema
(src/nfc-test/test-sdr/src/main/cpp/main.cpp:47-136): a JSON object with a
"frames" array; each entry carries the full frame metadata plus the payload as
colon-separated hex.  Only Poll/Listen frames are stored/compared
(main.cpp:104,171).
"""

from __future__ import annotations

import json

from ..core.frame import Frame, FrameType

# frame types included in golden comparison (main.cpp:104,171)
GOLDEN_TYPES = (FrameType.NfcPollFrame, FrameType.NfcListenFrame)


def _parse_hex(s: str) -> bytes:
    if not s:
        return b""
    return bytes(int(tok, 16) for tok in s.split(":"))


def read_golden_frames(path: str) -> list[Frame]:
    with open(path) as f:
        data = json.load(f)
    frames = []
    for e in data.get("frames", []):
        frames.append(
            Frame(
                tech_type=e["techType"],
                frame_type=e["frameType"],
                frame_phase=e["framePhase"],
                frame_flags=e["frameFlags"],
                frame_rate=e["frameRate"],
                data=_parse_hex(e["frameData"]),
                sample_start=e["sampleStart"],
                sample_end=e["sampleEnd"],
                sample_rate=e["sampleRate"],
                time_start=e["timeStart"],
                time_end=e["timeEnd"],
                date_time=e["dateTime"],
            )
        )
    return frames


def write_golden_frames(path: str, frames: list[Frame]) -> None:
    out = []
    for f in frames:
        if f.frame_type not in GOLDEN_TYPES:
            continue
        out.append(
            {
                "techType": int(f.tech_type),
                "dateTime": f.date_time,
                "sampleStart": int(f.sample_start),
                "sampleEnd": int(f.sample_end),
                "sampleRate": int(f.sample_rate),
                "timeStart": f.time_start,
                "timeEnd": f.time_end,
                "frameType": int(f.frame_type),
                "frameRate": int(f.frame_rate),
                "frameFlags": int(f.frame_flags),
                "framePhase": int(f.frame_phase),
                "frameData": f.hex_data,
            }
        )
    with open(path, "w") as fh:
        json.dump({"frames": out}, fh, indent=2)
        fh.write("\n")
