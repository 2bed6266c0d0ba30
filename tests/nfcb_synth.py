"""Synthetic NFC-B (ISO14443-B) 106 kbps poll waveform generator.

Magnitude-domain ASK NRZ (NfcB.cpp:238-436 detect, :438-763 decode): SOF
is a falling edge, 10 etu low, rising edge, 2 etu high; each character is
start(0) + 8 data bits LSB-first + stop(1); EOF is 10 etu low then high.
The modulation is a partial drop (LOW below the NfcB edge threshold
min_deep = 0.10 of the envelope, well under the 0.90 recover ceiling).
"""

from __future__ import annotations

import numpy as np

SAMPLE_RATE = 10_000_000
ETU = 94
HIGH = np.float32(0.5)
LOW = np.float32(0.3)


class BPollWriter:
    def __init__(self, lead: int = 8192):
        self.chunks = [np.full(lead, HIGH, np.float32)]

    def _lvl(self, level, etus: float):
        self.chunks.append(
            np.full(int(round(etus * ETU)), level, np.float32)
        )

    def sof(self):
        self._lvl(LOW, 10.5)
        self._lvl(HIGH, 2)

    def char(self, byte: int):
        self._lvl(LOW, 1)  # start bit
        for i in range(8):
            self._lvl(HIGH if (byte >> i) & 1 else LOW, 1)
        self._lvl(HIGH, 1)  # stop bit

    def eof(self):
        self._lvl(LOW, 10.5)
        self._lvl(HIGH, 4)

    def frame(self, data: bytes):
        self.sof()
        for b in data:
            self.char(b)
        self.eof()

    def gap(self, samples: int = 800_000):
        self.chunks.append(np.full(samples, HIGH, np.float32))

    def build(self, tail: int = 16384) -> np.ndarray:
        self.chunks.append(np.full(tail, HIGH, np.float32))
        return np.concatenate(self.chunks)


def crc_b(data: bytes) -> bytes:
    """ISO14443-B CRC16 bytes to append (init 0xFFFF, reflected,
    inverted)."""
    from nfclab.protocol.crc import crc16_ccitt

    v = (~crc16_ccitt(data, 0, len(data), 0xFFFF, True)) & 0xFFFF
    return bytes((v & 0xFF, (v >> 8) & 0xFF))
