"""Shared demodulator state and event-walk helpers.

The reference decoders are per-sample state machines (NfcTech.h:221-315).  The
TPU-native design precomputes all dense signals (conditioning + correlator
channels) and the host FSM only *visits* samples where state can change:
threshold-crossing events (from dense masks) and scheduled times (search
windows, guards).  Visiting extra samples is always safe because every step
re-checks its conditions exactly; the event sets are supersets of the samples
where the reference machine mutates state.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# reference ring size; detect starts once clock >= BUFFER_SIZE
# (NfcA.cpp:220-221 and equivalents)
BUFFER_SIZE = 1024


@dataclass
class ModulationStatus:
    """Mirror of NfcModulationStatus (NfcTech.h:221-259), minus the data
    buffers (which are pure channel arrays here)."""

    search_mode_state: int = 0
    search_start_time: int = 0
    search_end_time: int = 0
    search_sync_time: int = 0
    search_pulse_width: int = 0
    search_value_threshold: float = 0.0
    search_phase_threshold: float = 0.0
    search_last_phase: float = 0.0
    search_last_value: float = 0.0
    search_sync_value: float = 0.0
    search_corr_d: float = 0.0
    search_corr_0: float = 0.0
    search_corr_1: float = 0.0
    symbol_start_time: int = 0
    symbol_end_time: int = 0
    symbol_rise_time: int = 0
    correlated_peak_value: float = 0.0
    correlated_peak_time: int = 0
    detector_peak_value: float = 0.0
    detector_peak_time: int = 0

    def reset(self):
        self.__init__()


@dataclass
class SymbolStatus:
    """Mirror of NfcSymbolStatus (NfcTech.h:264-273)."""

    pattern: int = 0
    value: int = 0
    start: int = 0
    end: int = 0
    edge: int = 0
    length: int = 0
    rate: int = 0

    def reset(self):
        self.__init__()


@dataclass
class StreamStatus:
    """Mirror of NfcStreamStatus (NfcTech.h:278-289)."""

    previous: int = 0
    pattern: int = 0
    bits: int = 0
    skip: int = 0
    data: int = 0
    flags: int = 0
    parity: int = 0
    bytes: int = 0
    buffer: bytearray = field(default_factory=bytearray)

    def reset(self):
        self.__init__()


@dataclass
class FrameStatus:
    """Mirror of NfcFrameStatus (NfcTech.h:294-315)."""

    last_command: int = 0
    frame_type: int = 0
    symbol_rate: int = 0
    frame_start: int = 0
    frame_end: int = 0
    guard_end: int = 0
    waiting_end: int = 0
    frame_guard_time: int = 0
    frame_waiting_time: int = 0
    start_up_guard_time: int = 0
    request_guard_time: int = 0


def next_index(sorted_idx: np.ndarray, t: int) -> int | None:
    """Smallest element of sorted_idx >= t, or None."""
    i = np.searchsorted(sorted_idx, t)
    if i >= len(sorted_idx):
        return None
    return int(sorted_idx[i])


def next_true(mask: np.ndarray, t: int, t_end: int) -> int | None:
    """Smallest index i with t <= i < t_end and mask[i]; None if none.

    Scans in growing chunks so long idle stretches don't pay full-array cost.
    """
    n = min(t_end, len(mask))
    chunk = 4096
    while t < n:
        hi = min(t + chunk, n)
        seg = mask[t:hi]
        nz = np.argmax(seg)
        if seg[nz]:
            return t + int(nz)
        t = hi
        chunk = min(chunk * 4, 1 << 20)
    return None


_F = np.float32


def sd_af(box, t: int, d: int, p1: int, p2: int):
    """On-the-fly detect SD read (A/F formulation) from the box channel —
    bit-identical to the dense array the FSMs previously indexed (zero below
    the first clock with full window history)."""
    if t < d + p1:
        return _F(0.0)
    u = t - d
    gap = p1 - p2
    a0 = box[u]
    a1 = box[u - gap]
    a2 = box[u - 1]
    return ((a0 - a1) - (a1 - a2)) / _F(p2)


def sd_v(box, t: int, d: int, p1: int, p2: int):
    """On-the-fly NFC-V detect SD read (reversed difference)."""
    if t < d + p1:
        return _F(0.0)
    u = t - d
    return (box[u - (p1 - p2)] - box[u]) / _F(p2)


def check_parity(value: int, parity: int) -> bool:
    """Odd-parity check (NfcA.cpp:1994-2005): returns the xor-accumulated
    parity, truthy when the stored parity bit is consistent."""
    for i in range(8):
        if value & (1 << i):
            parity ^= 1
    return bool(parity)
