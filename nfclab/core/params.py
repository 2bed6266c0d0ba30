"""Signal and bitrate timing parameters.

Reproduces the reference's parameter derivations exactly:

- ``SignalParams``: NfcDecoder.cpp:295-329 (``NfcDecoder::Impl::initialize``) —
  IIR DC-removal coefficient, the three exponential-average weight pairs, the
  sample time unit (samples per carrier cycle) and the carrier hysteresis
  thresholds.
- ``BitrateParams``: tech/NfcA.cpp:140-192 (identically shaped in NfcB/F/V) —
  per-rate symbol sample counts (1/2/¼/⅛ symbol periods), the
  ``symbolDelayDetect`` cascade, and the ring-buffer offset indices.

All rounding matches the C++ (std::round for periods, truncation where the
reference truncates).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from . import nfc

# ring buffer length of the reference decoder (NfcTech.h:40); offsets are
# expressed relative to it so symbol times match the reference exactly
BUFFER_SIZE = 1024


@dataclass
class SignalParams:
    sample_rate: int
    # 1/fc in samples (NfcDecoder.cpp:307)
    sample_time_unit: float = 0.0
    # base ETU in samples, truncated int (NfcDecoder.cpp:310)
    elementary_time_unit: int = 0
    # IIR DC removal coefficient (NfcDecoder.cpp:313)
    signal_iir_dc_a: float = 0.9
    # exponential average weights (NfcDecoder.cpp:316-325)
    signal_enve_w0: float = 0.0
    signal_enve_w1: float = 0.0
    signal_mdev_w0: float = 0.0
    signal_mdev_w1: float = 0.0
    signal_mean_w0: float = 0.0
    signal_mean_w1: float = 0.0
    # carrier hysteresis thresholds (NfcDecoder.cpp:327-329)
    power_level_threshold: float = 0.01
    signal_low_threshold: float = 0.0090
    signal_high_threshold: float = 0.0110

    def __post_init__(self):
        import numpy as np

        rate = float(self.sample_rate)
        self.sample_time_unit = rate / nfc.NFC_FC
        self.elementary_time_unit = int(self.sample_time_unit * 128)
        # float32 casts mirror the C++ static_cast<float>(...)
        self.signal_iir_dc_a = float(np.float32(0.9))
        self.signal_enve_w0 = float(np.float32(1 - 5e5 / rate))
        self.signal_enve_w1 = float(np.float32(1 - np.float64(self.signal_enve_w0)))
        self.signal_mdev_w0 = float(np.float32(1 - 2e5 / rate))
        self.signal_mdev_w1 = float(np.float32(1 - np.float64(self.signal_mdev_w0)))
        self.signal_mean_w0 = float(np.float32(1 - 5e4 / rate))
        self.signal_mean_w1 = float(np.float32(1 - np.float64(self.signal_mean_w0)))
        self.signal_low_threshold = self.power_level_threshold / 1.25
        self.signal_high_threshold = self.power_level_threshold * 1.25


@dataclass
class BitrateParams:
    """Per-rate symbol timing (tech/NfcA.cpp:140-192)."""

    tech_type: int
    rate_type: int
    symbols_per_second: int
    period0: int  # double symbol samples
    period1: int  # full symbol samples
    period2: int  # half symbol
    period4: int  # quarter symbol
    period8: int  # eighth symbol
    symbol_delay_detect: int
    # ring offsets (offsetXxxIndex in the reference); signal time for an index
    # advanced by `offset_signal + clock` is `clock - symbol_delay_detect`
    offset_future: int = 0
    offset_signal: int = 0
    offset_delay0: int = 0
    offset_delay1: int = 0
    offset_delay2: int = 0
    offset_delay4: int = 0
    offset_delay8: int = 0


def nfca_bitrates(sample_rate: int, tech_type: int = 0x0101) -> list[BitrateParams]:
    """NFC-A bitrate cascade for 106/212/424 kbps (tech/NfcA.cpp:140-192).

    The symbol period is ``128 >> rate`` carrier cycles; the delay-detect
    cascade offsets each faster rate past the slower ones so all rates can be
    searched simultaneously against the same ring buffer.
    """
    stu = float(sample_rate) / nfc.NFC_FC
    out: list[BitrateParams] = []
    prev: BitrateParams | None = None
    for rate in (nfc.R106K, nfc.R212K, nfc.R424K):
        sym_per_sec = int(round(nfc.NFC_FC / float(128 >> rate)))
        p0 = int(round(stu * (256 >> rate)))
        p1 = int(round(stu * (128 >> rate)))
        p2 = int(round(stu * (64 >> rate)))
        p4 = int(round(stu * (32 >> rate)))
        p8 = int(round(stu * (16 >> rate)))
        delay = (prev.symbol_delay_detect + prev.period1) if prev is not None else 0
        b = BitrateParams(
            tech_type=tech_type,
            rate_type=rate,
            symbols_per_second=sym_per_sec,
            period0=p0,
            period1=p1,
            period2=p2,
            period4=p4,
            period8=p8,
            symbol_delay_detect=delay,
            offset_future=BUFFER_SIZE,
            offset_signal=BUFFER_SIZE - delay,
            offset_delay0=BUFFER_SIZE - delay - p0,
            offset_delay1=BUFFER_SIZE - delay - p1,
            offset_delay2=BUFFER_SIZE - delay - p2,
            offset_delay4=BUFFER_SIZE - delay - p4,
            offset_delay8=BUFFER_SIZE - delay - p8,
        )
        out.append(b)
        prev = b
    return out
