"""Signal containers and stream typing.

Parity with ``hw::SignalBuffer`` / ``hw::SignalType``
(hw-dev/.../hw/SignalBuffer.h:29-60, hw/SignalType.h:27-49): a float sample
block with sampleRate/offset/decimation/stride/id metadata — the payload type
of every pipeline stream.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import numpy as np


class SignalType(enum.IntEnum):
    # hw/SignalType.h:27-49
    SIGNAL_TYPE_RADIO_IQ = 1
    SIGNAL_TYPE_RADIO_SAMPLES = 2
    SIGNAL_TYPE_RADIO_SIGNAL = 3
    SIGNAL_TYPE_LOGIC_SAMPLES = 4
    SIGNAL_TYPE_LOGIC_SIGNAL = 5
    SIGNAL_TYPE_FFT_BIN = 6
    SIGNAL_TYPE_CLK_SIGNAL = 7


@dataclass
class SignalBuffer:
    """Sample block: data[N] or data[N, stride] float32 + stream metadata."""

    data: np.ndarray
    sample_rate: int = 0
    offset: int = 0  # absolute sample offset of the first sample
    decimation: int = 0
    signal_type: SignalType = SignalType.SIGNAL_TYPE_RADIO_SAMPLES
    stream_id: int = 0

    @property
    def stride(self) -> int:
        return 1 if self.data.ndim == 1 else self.data.shape[-1]

    @property
    def elements(self) -> int:
        return len(self.data)

    @property
    def valid(self) -> bool:
        return self.data.size > 0

    @classmethod
    def eof(cls, sample_rate: int = 0, signal_type=SignalType.SIGNAL_TYPE_RADIO_SAMPLES):
        """In-band EOF marker: an empty/invalid buffer
        (RadioDeviceTask.cpp:229-233)."""
        return cls(np.empty(0, np.float32), sample_rate, 0, 0, signal_type)
