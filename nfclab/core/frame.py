"""Decoded-frame value type and enums.

Parity contract with the reference's ``lab::RawFrame``
(src/nfc-lib/lib-lab/lab-data/src/main/include/lab/data/RawFrame.h:29-84 for the
enums, src/nfc-lib/lib-lab/lab-data/src/main/cpp/RawFrame.cpp:82-97 for the
equality semantics): two frames are equal iff techType, frameType, frameFlags,
framePhase, frameRate, sampleStart, sampleEnd, sampleRate and the payload bytes
all match.  Time fields (timeStart/timeEnd/dateTime) are informational and
excluded from equality — this is exactly the criterion the reference's golden
regression harness uses (src/nfc-test/test-sdr/src/main/cpp/main.cpp:200-207).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class FrameTech(enum.IntEnum):
    # RawFrame.h:29-43
    NoneTech = 0x0000
    NfcAnyTech = 0x0100
    NfcATech = 0x0101
    NfcBTech = 0x0102
    NfcFTech = 0x0103
    NfcVTech = 0x0104
    IsoAnyTech = 0x0200
    Iso7816Tech = 0x0201


class FrameType(enum.IntEnum):
    # RawFrame.h:45-62
    NfcCarrierOff = 0x0100
    NfcCarrierOn = 0x0101
    NfcPollFrame = 0x0102
    NfcListenFrame = 0x0103
    IsoVccLow = 0x0200
    IsoVccHigh = 0x0201
    IsoRstLow = 0x0202
    IsoRstHigh = 0x0203
    IsoATRFrame = 0x0210
    IsoRequestFrame = 0x0211
    IsoResponseFrame = 0x0212
    IsoExchangeFrame = 0x0213


class FramePhase(enum.IntEnum):
    # RawFrame.h:64-74
    NfcAnyPhase = 0x0100
    NfcCarrierPhase = 0x0101
    NfcSelectionPhase = 0x0102
    NfcApplicationPhase = 0x0103
    IsoAnyPhase = 0x0200


class FrameFlags(enum.IntFlag):
    # RawFrame.h:76-84
    ShortFrame = 0x01
    Encrypted = 0x02
    Truncated = 0x08
    ParityError = 0x10
    CrcError = 0x20
    SyncError = 0x40


@dataclass
class Frame:
    """A decoded frame (protocol data unit) with sample-accurate boundaries."""

    tech_type: int = FrameTech.NoneTech
    frame_type: int = 0
    frame_phase: int = FramePhase.NfcAnyPhase
    frame_flags: int = 0
    frame_rate: int = 0
    data: bytes = b""

    # sample-domain boundaries (part of equality)
    sample_start: int = 0
    sample_end: int = 0
    sample_rate: int = 0

    # time-domain boundaries (informational, NOT part of equality)
    time_start: float = 0.0
    time_end: float = 0.0
    date_time: float = 0.0

    def set_flags(self, flags: int) -> None:
        self.frame_flags |= flags

    def clear_flags(self, flags: int) -> None:
        self.frame_flags &= ~flags

    def has_flags(self, flags: int) -> bool:
        return bool(self.frame_flags & flags)

    # equality per RawFrame.cpp:82-97
    _EQ_FIELDS = (
        "tech_type",
        "frame_type",
        "frame_flags",
        "frame_phase",
        "frame_rate",
        "sample_start",
        "sample_end",
        "sample_rate",
    )

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Frame):
            return NotImplemented
        for f in self._EQ_FIELDS:
            if getattr(self, f) != getattr(other, f):
                return False
        return self.data == other.data

    def __hash__(self):
        return hash((tuple(getattr(self, f) for f in self._EQ_FIELDS), self.data))

    def diff(self, other: "Frame") -> str:
        """Human-readable field-by-field diff (for test failure messages)."""
        out = []
        for f in self._EQ_FIELDS:
            a, b = getattr(self, f), getattr(other, f)
            if a != b:
                out.append(f"{f}: {a} != {b}")
        if self.data != other.data:
            out.append(f"data: {self.data.hex(':')} != {other.data.hex(':')}")
        return "; ".join(out) or "equal"

    @property
    def hex_data(self) -> str:
        return ":".join(f"{b:02X}" for b in self.data)

    def __repr__(self):
        try:
            tt = FrameTech(self.tech_type).name
        except ValueError:
            tt = hex(self.tech_type)
        try:
            ft = FrameType(self.frame_type).name
        except ValueError:
            ft = hex(self.frame_type)
        return (
            f"Frame({tt}, {ft}, phase={self.frame_phase:#x}, flags={self.frame_flags:#x}, "
            f"rate={self.frame_rate}, samples=[{self.sample_start},{self.sample_end}], "
            f"data={self.hex_data})"
        )
