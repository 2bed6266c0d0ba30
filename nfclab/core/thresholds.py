"""Per-tech decoder thresholds — the single source of truth.

The reference exposes per-tech modulation-depth min/max and correlation
thresholds on the decoder facade (NfcDecoder.h:79-117) and merges them
from JSON config (RadioDecoderTask.cpp:207-366 ``configDecoder``).  This
module holds the one copy of those values: the demod FSMs, the host
channel builders (dsp/channels.py via the tech fields), the fused Pallas
kernel's detect-mask params, and the sharded multi-chip mask math all
consume a ``DecoderThresholds`` instead of re-stating the numbers.

Defaults are the reference's (NfcA.cpp:93-100, NfcB.cpp:103-109,
NfcF.cpp:88-94, NfcV.cpp:101-107).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass
class TechThresholds:
    """One tech's tuning knobs (NfcA.cpp:93-100 field trio)."""

    min_modulation_deep: float
    max_modulation_deep: float
    correlation: float


def _default_nfca() -> TechThresholds:
    return TechThresholds(0.90, 1.00, 0.75)  # NfcA.cpp:94,97,100


def _default_nfcb() -> TechThresholds:
    return TechThresholds(0.10, 0.90, 0.50)  # NfcB.cpp:103,106,109


def _default_nfcf() -> TechThresholds:
    return TechThresholds(0.10, 0.90, 0.50)  # NfcF.cpp:88,91,94


def _default_nfcv() -> TechThresholds:
    return TechThresholds(0.90, 1.00, 0.50)  # NfcV.cpp:101,104,107


@dataclass
class DecoderThresholds:
    nfca: TechThresholds = field(default_factory=_default_nfca)
    nfcb: TechThresholds = field(default_factory=_default_nfcb)
    nfcf: TechThresholds = field(default_factory=_default_nfcf)
    nfcv: TechThresholds = field(default_factory=_default_nfcv)

    def copy(self) -> "DecoderThresholds":
        return DecoderThresholds(
            replace(self.nfca), replace(self.nfcb),
            replace(self.nfcf), replace(self.nfcv),
        )

    def for_tech(self, name: str) -> TechThresholds:
        return getattr(self, name)

    def detect_mask_tuple(self, power_level_threshold: float) -> tuple:
        """The 5-tuple the detect-trigger mask math runs on — fused kernel
        ``mask_params`` (dsp/pallas/fused_frontend.py), the sharded
        re-derivation (shard/multichip.py), and the host index channels all
        trigger on these values: (power threshold, NfcA correlation, NfcB
        minimumModulationDeep [the NfcB.cpp:280 searchValueThreshold edge
        trigger], NfcF correlation, NfcV correlation)."""
        return (
            float(power_level_threshold),
            float(self.nfca.correlation),
            float(self.nfcb.min_modulation_deep),
            float(self.nfcf.correlation),
            float(self.nfcv.correlation),
        )

    def merge_protocol_config(self, proto: dict) -> "DecoderThresholds":
        """Merge a ``protocol`` JSON config subtree onto the CURRENT values
        (RadioDecoderTask.cpp:240-345 semantics: correlationThreshold
        applies alone; minimumModulationDeep/maximumModulationDeep apply
        only when both are present).  Mutates and returns self."""
        for name in ("nfca", "nfcb", "nfcf", "nfcv"):
            sect = proto.get(name) or {}
            tech = self.for_tech(name)
            if "correlationThreshold" in sect:
                tech.correlation = float(sect["correlationThreshold"])
            lo = sect.get("minimumModulationDeep")
            hi = sect.get("maximumModulationDeep")
            if lo is not None and hi is not None:
                tech.min_modulation_deep = float(lo)
                tech.max_modulation_deep = float(hi)
        return self

    @classmethod
    def from_protocol_config(cls, proto: dict) -> "DecoderThresholds":
        """Defaults + a ``protocol`` JSON config subtree."""
        return cls().merge_protocol_config(proto)
