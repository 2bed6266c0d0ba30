"""Signal-level debug tap: internal DSP channels to a multi-channel WAV.

Parity with the reference's decoder debug recorder (NfcTech.h:47-126,
IsoTech.h:43-120, wired at NfcDecoder.cpp:343-352): when enabled, the decoder
writes its internal per-sample signals to a timestamped WAV for golden-signal
diagnosis.  Channel layout mirrors DEBUG_SIGNAL_*_CHANNEL:

radio (10 ch): 0=value 1=filtered 2=deviation 3=average then per-rate
detect SD channels (the decoder-internal correlators).
logic (10 ch): 0-3=channel data, 4-7=channel edges.
"""

from __future__ import annotations

import time

import numpy as np

from ..io.wav import write_wav

DEBUG_CHANNELS = 10


def write_radio_debug(cond, sd_channels: list[np.ndarray], sample_rate: int,
                      path: str | None = None) -> str:
    if path is None:
        path = time.strftime("radio-debug-%Y%m%d%H%M%S.wav")
    n = len(cond.value)
    out = np.zeros((n, DEBUG_CHANNELS), np.float32)
    out[:, 0] = cond.value
    out[:, 1] = cond.filtered
    out[:, 2] = cond.deviation
    out[:, 3] = cond.average
    for i, sd in enumerate(sd_channels[: DEBUG_CHANNELS - 4]):
        out[:, 4 + i] = sd[:n]
    write_wav(path, out, sample_rate)
    return path


def write_logic_debug(samples: np.ndarray, sample_rate: int,
                      path: str | None = None) -> str:
    if path is None:
        path = time.strftime("logic-debug-%Y%m%d%H%M%S.wav")
    n, ch = samples.shape
    out = np.zeros((n, DEBUG_CHANNELS), np.float32)
    out[:, : min(ch, 4)] = samples[:, :4]
    edges = np.zeros_like(samples)
    edges[1:] = samples[1:] - samples[:-1]
    out[:, 4 : 4 + min(ch, 4)] = edges[:, :4]
    write_wav(path, out, sample_rate)
    return path
