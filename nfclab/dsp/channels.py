"""Correlator channel arrays.

The reference decoders maintain per-sample incremental integrators over ring
buffers (NfcA.cpp:236-255 etc.).  In steady state every one of those
integrators is a *pure function of the signal*: a boxcar sum of some per-sample
integrand, evaluated at a lag.  This module computes those boxcar channels
densely (vectorized; on TPU these are the inner loops of the fused Pallas
pipeline, here exposed with a numpy fallback) so the host symbol-walk FSMs can
read correlation values at arbitrary sample times in O(1).

Channel definitions (sample-time u, decoder-clock t, delay d = symbolDelayDetect):

- ``box_value[r](u)``  = sum value[u-p2+1 .. u]           (NfcA.cpp:246-250)
  The detect/poll ASK integrator: FI(t) = box_value(t - d).
- ``box_sq[r](u)``     = sum (filtered^2 * 10)[u-p2+1..u] (NfcA.cpp:963-970)
  The listen ASK integrator.
- ``box_bpsk[r](u)``   = sum (filtered[v]*filtered[v-p1]*10)[u-p4+1..u]
  The BPSK phase integrator window (NfcA.cpp:1243-1266).

Correlation factors derived from a box channel B at clock t
(ring slot analysis of NfcA.cpp:241-255):

    S0(t) = B(t-d) - B(t-d-(p1-p2))
    S1(t) = B(t-d-(p1-p2)) - B(t-d-1)
    SD(t) = (S0-S1)/p2   (signed, detect)  or |S0-S1|/p2 (poll)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def box_sum(x: np.ndarray, width: int) -> np.ndarray:
    """B[u] = sum x[max(0, u-width+1) .. u], float32 output computed with a
    float64 running sum (the reference's f32 running integrator drifts by a
    comparable epsilon; goldens are the accuracy contract).  Native C++
    single pass when available; numpy prefix-sum fallback."""
    try:
        from ..native.binding import box_sum_native, native_available

        if native_available():
            return box_sum_native(x, width)
    except Exception:
        pass
    c = np.cumsum(x.astype(np.float64))
    out = c.copy()
    out[width:] = c[width:] - c[:-width]
    return out.astype(np.float32)


class LazyChannels:
    """Per-tech, per-rate channel cache over a conditioned signal."""

    def __init__(self, cond):
        self.cond = cond
        self._cache: dict = {}

    def _get(self, key, fn):
        if key not in self._cache:
            self._cache[key] = fn()
        return self._cache[key]

    def box_value(self, p2: int) -> np.ndarray:
        return self._get(("bv", p2), lambda: box_sum(self.cond.value, p2))

    def box_sq(self, p2: int) -> np.ndarray:
        def f():
            try:
                from ..native.binding import box_sq_native, native_available

                if native_available():
                    return box_sq_native(self.cond.filtered, p2)
            except Exception:
                pass
            q = self.cond.filtered.astype(np.float32)
            q = q * q * np.float32(10.0)
            return box_sum(q, p2)

        return self._get(("bq", p2), f)

    def box_bpsk(self, p1: int, p4: int) -> np.ndarray:
        def f():
            try:
                from ..native.binding import box_bpsk_native, native_available

                if native_available():
                    return box_bpsk_native(self.cond.filtered, p1, p4)
            except Exception:
                pass
            fl = self.cond.filtered.astype(np.float32)
            prod = np.zeros_like(fl)
            prod[p1:] = fl[p1:] * fl[:-p1] * np.float32(10.0)
            return box_sum(prod, p4)

        return self._get(("bp", p1, p4), f)

    def corr_s0_dense(self, br) -> np.ndarray:
        """Dense listen-ASK S0(t) by decoder clock: S0 = Bq(t-d) - Bq(t-d-(p1-p2))
        with Bq the squared-filtered box channel (NfcA.cpp:963-973).  Zero below
        the first clock with a full window history."""
        key = ("s0q_t", br.tech_type, br.rate_type)

        def f():
            bq = self.box_sq(br.period2)
            d, p1, p2 = br.symbol_delay_detect, br.period1, br.period2
            n = len(bq)
            out = np.zeros(n, np.float32)
            lo = d + p1
            gap = p1 - p2
            out[lo:] = bq[lo - d : n - d] - bq[lo - d - gap : n - d - gap]
            return out

        return self._get(key, f)

    def bpsk_dense(self, br) -> np.ndarray:
        """Dense BPSK phase window PB4 by decoder clock: PB4(t) indexed so that
        phaseIntegrate(t) = PB4[t] - PB4[guardEnd-1] (NfcA.cpp:1243-1266)."""
        key = ("pb4_t", br.tech_type, br.rate_type)

        def f():
            pb = self.box_bpsk(br.period1, br.period4)
            d = br.symbol_delay_detect
            n = len(pb)
            out = np.zeros(n, np.float32)
            out[d:] = pb[: n - d]
            return out

        return self._get(key, f)

    def nfcv_listen_dense(self, br) -> np.ndarray:
        """NFC-V listen channel by decoder clock (NfcV.cpp:825-835): the
        squared-filtered signal box-summed over a FULL symbol (p1) in a
        p0-cycle ring, so S0(t) = B1q(t-d-(p0-p1)) - B1q(t-d)."""
        key = ("vq_t", br.rate_type)

        def f():
            b1q = self.box_sq(br.period1)
            d, p0, p1 = br.symbol_delay_detect, br.period0, br.period1
            n = len(b1q)
            out = np.zeros(n, np.float32)
            lo = d + p0
            gap = p0 - p1
            out[lo:] = b1q[lo - d - gap : n - d - gap] - b1q[lo - d : n - d]
            return out

        return self._get(key, f)

    def detect_sd_idx(self, box, d, p1, p2, corr_thr, power_thr, signed_v=False):
        """Fused native SD channel + threshold-crossing clock indices
        (channels.cpp one-pass kernels); None when native is unavailable
        (callers keep their numpy fallback).  signed_v selects the NFC-V
        formulation (reversed difference, signed threshold)."""
        try:
            from ..native.binding import detect_sd_idx_native, native_available

            if not native_available():
                return None
        except Exception:
            return None
        key = (
            "sdidx",
            id(box),
            d,
            p1,
            p2,
            float(corr_thr),
            float(power_thr),
            bool(signed_v),
        )
        return self._get(
            key,
            lambda: detect_sd_idx_native(
                box, self.cond.envelope, d, p1, p2, corr_thr, power_thr, signed_v
            ),
        )

    def gt_idx(self, x: np.ndarray, thr) -> np.ndarray:
        """Indices where x > thr (native one-pass; numpy fallback)."""
        key = ("gtidx", id(x), float(thr))

        def f():
            try:
                from ..native.binding import collect_gt_native, native_available

                if native_available():
                    return collect_gt_native(x, thr)
            except Exception:
                pass
            return np.flatnonzero(x > thr)

        return self._get(key, f)

    def edge_idx_b(self, d: int, min_deep, power_thr) -> np.ndarray:
        """NFC-B falling-edge trigger indices (NfcB.cpp:283 condition over
        the d-shifted filtered signal), from clock 1024 on."""
        key = ("eidxb", d, float(min_deep), float(power_thr))

        def f():
            try:
                from ..native.binding import edge_mask_b_native, native_available

                if native_available():
                    return edge_mask_b_native(
                        self.cond.filtered,
                        self.cond.envelope,
                        d,
                        min_deep,
                        power_thr,
                    )
            except Exception:
                pass
            filt = self.cond.filtered
            env = self.cond.envelope
            power = env >= power_thr
            if d:
                shifted = np.empty_like(filt)
                shifted[d:] = filt[: len(filt) - d]
                shifted[:d] = 0.0
            else:
                shifted = filt
            mask = power & (shifted < -(min_deep * env))
            mask[:1024] = False  # ring warm-up (BUFFER_SIZE)
            return np.flatnonzero(mask)

        return self._get(key, f)

    def corr_s0_s1(self, box: np.ndarray, t, d: int, p1: int, p2: int):
        """S0, S1 at decoder clock(s) t (scalar or array)."""
        u = np.asarray(t) - d
        s0 = box[u] - box[u - (p1 - p2)]
        s1 = box[u - (p1 - p2)] - box[u - 1]
        return s0, s1

    def detect_sd(self, box: np.ndarray, d: int, p1: int, p2: int) -> np.ndarray:
        """Dense signed SD(t) for all clocks t (invalid below t < d+p1; callers
        gate on t >= BUFFER_SIZE anyway)."""
        key = ("sd", id(box), d, p1, p2)

        def f():
            n = len(box)
            sd = np.zeros(n, np.float32)
            lo = d + p1  # first clock with a fully valid window history
            gap = p1 - p2
            a0 = box[lo - d : n - d]
            a1 = box[lo - d - gap : n - d - gap]
            a2 = box[lo - d - 1 : n - d - 1]
            s0 = a0 - a1
            s1 = a1 - a2
            sd[lo:] = (s0 - s1) / np.float32(p2)
            return sd

        return self._get(key, f)
