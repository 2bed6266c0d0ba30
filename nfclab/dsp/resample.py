"""Adaptive render resampling: dense streams -> (value, offset) pairs.

Parity with ``SignalResamplingTask`` (SignalResamplingTask.cpp:30-272):

- radio: a 51-sample moving-average deviation trigger (threshold 0.005) with
  a forced point every 255 samples and "control points" (the previous sample)
  inserted ahead of each deviation event (:168-225)
- logic: change-triggered per channel (CLK skipped), forced point every 255
  samples (:227-272)

The deviation trigger mask is vectorized (boxcar mean via prefix sums); only
the sparse selected events are walked to reproduce the reference's control
point and interval semantics exactly.
"""

from __future__ import annotations

import numpy as np

WINDOW = 51
THRESHOLD = 0.005
LOGIC_INTERVAL = 255
RADIO_INTERVAL = 255


def resample_radio(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Returns (points, offsets) replicating processRadioSignal exactly."""
    x = values.astype(np.float32)
    n = len(x)
    if n == 0:
        return np.empty(0, np.float32), np.empty(0, np.float32)

    # moving average with the reference's asymmetric warm-up: at sample i the
    # accumulator holds x[max(0, i-25) .. min(n-1, i+25)] but is always
    # divided by 51
    c = np.cumsum(x, dtype=np.float64)
    half = WINDOW // 2
    hi = np.minimum(np.arange(n) + half, n - 1)
    lo = np.arange(n) - half - 1
    upper = c[hi]
    lower = np.where(lo >= 0, c[np.maximum(lo, 0)], 0.0)
    avrg = (upper - lower).astype(np.float32)
    stdev = np.abs(x - avrg / np.float32(WINDOW))
    mask = stdev > np.float32(THRESHOLD)

    out_v: list[float] = [float(x[0])]
    out_o: list[float] = [0.0]
    sel = np.flatnonzero(mask)
    ptr = 0
    c_idx = 0  # last control point index
    while True:
        nxt = sel[ptr] if ptr < len(sel) else None
        forced = c_idx + RADIO_INTERVAL
        if nxt is not None and nxt <= forced:
            i = int(nxt)
            ptr += 1
            p = i - 1
            if c_idx < p:
                out_v.append(float(x[p]))
                out_o.append(float(p))
            out_v.append(float(x[i]))
            out_o.append(float(i))
            c_idx = i
        elif forced < n:
            i = forced
            out_v.append(float(x[i]))
            out_o.append(float(i))
            c_idx = i
            while ptr < len(sel) and sel[ptr] <= i:
                ptr += 1
        else:
            break

    p = n - 2  # p ends at i-1 with i == n
    if c_idx < p + 1:
        # reference appends (last, p) where last = x[n-1] read at loop end
        out_v.append(float(x[n - 1]))
        out_o.append(float(p + 1))
    return np.asarray(out_v, np.float32), np.asarray(out_o, np.float32)


def resample_logic(samples: np.ndarray, skip_clk: bool = True):
    """samples: [N, ch]; returns {channel: (values, offsets)} replicating
    processLogicSignal."""
    n, ch = samples.shape
    out = {}
    for k in range(ch):
        if skip_clk and k == 1:
            continue
        x = samples[:, k].astype(np.float32)
        changes = np.flatnonzero(x[1:] != x[:-1]) + 1
        vals = [float(x[0])]
        offs = [0.0]
        c_idx = 0
        ptr = 0
        while True:
            nxt = changes[ptr] if ptr < len(changes) else None
            forced = c_idx + LOGIC_INTERVAL
            if nxt is not None and nxt <= forced:
                i = int(nxt)
                ptr += 1
                vals.append(float(x[i]))
                offs.append(float(i))
                c_idx = i
            elif forced < n:
                i = forced
                vals.append(float(x[i]))
                offs.append(float(i))
                c_idx = i
            else:
                break
        out[k] = (np.asarray(vals, np.float32), np.asarray(offs, np.float32))
    return out
