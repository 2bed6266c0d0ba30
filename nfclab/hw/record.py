"""WAV replay/record device.

Parity with ``hw::RecordDevice`` (hw-dev/.../cpp/hw/RecordDevice.cpp): a full
SignalDevice over a WAV file, so file replay exercises the same pipeline code
paths as live hardware (the reference's fake/replay testing strategy,
SURVEY.md §4.5).  Radio records are mono magnitude or stereo IQ; logic
records are 4+ channel.
"""

from __future__ import annotations

import numpy as np

from ..io.wav import read_wav, write_wav
from .device import (
    PARAM_CHANNEL_COUNT,
    PARAM_SAMPLE_RATE,
    SignalDevice,
)
from .signal import SignalBuffer, SignalType


class RecordDevice(SignalDevice):
    def __init__(self, path: str):
        super().__init__(f"record://{path}")
        self.path = path
        self._samples: np.ndarray | None = None
        self._pos = 0
        self._mode = "read"
        self._write_chunks: list[np.ndarray] = []

    def open(self, mode: str = "read") -> bool:
        self._mode = mode
        if mode == "read":
            samples, info = read_wav(self.path)
            self._samples = samples
            self._pos = 0
            self.set(PARAM_SAMPLE_RATE, info.sample_rate)
            self.set(PARAM_CHANNEL_COUNT, info.channels)
        else:
            self._write_chunks = []
        return super().open(mode)

    def close(self):
        if self._mode == "write" and self._write_chunks:
            data = np.concatenate(self._write_chunks)
            write_wav(self.path, data, int(self.get(PARAM_SAMPLE_RATE, 0)))
        super().close()

    def is_eof(self) -> bool:
        return self._samples is None or self._pos >= len(self._samples)

    def read(self, count: int) -> SignalBuffer:
        assert self._samples is not None, "device not open for read"
        chunk = self._samples[self._pos : self._pos + count]
        channels = int(self.get(PARAM_CHANNEL_COUNT, 1))
        if channels >= 4:
            stype = SignalType.SIGNAL_TYPE_LOGIC_SAMPLES
        elif channels == 2:
            stype = SignalType.SIGNAL_TYPE_RADIO_IQ
        else:
            stype = SignalType.SIGNAL_TYPE_RADIO_SAMPLES
        buf = SignalBuffer(
            chunk,
            int(self.get(PARAM_SAMPLE_RATE, 0)),
            offset=self._pos,
            signal_type=stype,
        )
        self._pos += len(chunk)
        return buf

    def write(self, buffer: SignalBuffer) -> int:
        self._write_chunks.append(np.asarray(buffer.data, np.float32))
        self.set(PARAM_SAMPLE_RATE, buffer.sample_rate)
        return buffer.elements
