"""IQ to magnitude conversion with power metering and software AGC.

Parity with the RadioDeviceTask hot loop (RadioDeviceTask.cpp:560-686): the
hand-written SSE square/shuffle/add/sqrt becomes a vectorized array op
(numpy on host, the same expression inside the jitted frontend on TPU), plus
the exponential level average and the gain-step AGC policy.
"""

from __future__ import annotations

import numpy as np

# AGC thresholds (RadioDeviceTask.cpp:48-49)
LOWER_GAIN_THRESHOLD = 0.05
UPPER_GAIN_THRESHOLD = 0.25
MAX_GAIN_STEP = 6


def iq_to_magnitude(iq: np.ndarray, avrg: float = 0.0):
    """iq: [N, 2] float32 -> (magnitude [N], signal_power, level_average).

    The level average is the 0.001-weight exponential average the reference
    updates every 4th sample; here it is computed over the strided subset
    with the same weights (order-equivalent closed form)."""
    iq = np.asarray(iq, np.float32)
    p = iq[:, 0] * iq[:, 0] + iq[:, 1] * iq[:, 1]
    mag = np.sqrt(p)
    power = float(np.sum(p, dtype=np.float64) / len(iq))
    return mag.astype(np.float32), power, level_average(mag, avrg)


def level_average(mag: np.ndarray, avrg: float) -> float:
    """Exponential signal-level average over every 4th magnitude sample
    (RadioDeviceTask.cpp:618), order-equivalent closed form — the input the
    software AGC steps on.  Shared by the IQ conversion path and
    magnitude-native drivers so AGC runs for every gain-capable device."""
    sub = np.asarray(mag, np.float64)[::4]
    w = 0.001
    if len(sub):
        decay = (1 - w) ** np.arange(len(sub) - 1, -1, -1)
        avrg = avrg * (1 - w) ** len(sub) + w * float(np.sum(sub * decay))
    return avrg


class SoftwareAgc:
    """Gain stepping between level thresholds (RadioDeviceTask.cpp:662-686)."""

    def __init__(self, gain: int = 3):
        self.gain = gain
        self._change_until = 0

    def update(self, level_average: float, offset: int, elements: int) -> int | None:
        if offset <= self._change_until:
            return None
        if level_average < LOWER_GAIN_THRESHOLD and self.gain < MAX_GAIN_STEP:
            self.gain += 1
            self._change_until = offset + elements
            return self.gain
        if level_average > UPPER_GAIN_THRESHOLD and self.gain > 0:
            self.gain -= 1
            self._change_until = offset + elements
            return self.gain
        return None
