"""Logic-analyzer decoder facade: [N, channels] logic capture in, frames out.

TPU-native equivalent of ``lab::IsoDecoder`` (IsoDecoder.cpp:123-216): channel
edges are computed vectorized and the ISO7816 FSM walks only edge/scheduled
events.  Accepts 4+ channel captures (IO/CLK/RST/VCC, DSLogic channel layout
per LogicDecoderTask).
"""

from __future__ import annotations

import numpy as np

from ..core.frame import Frame
from ..demod.iso7816 import Iso7816Decoder


class IsoDecoder:
    def __init__(self, enable_iso7816: bool = True, stream_time: float = 0.0):
        self.enable_iso7816 = enable_iso7816
        self.stream_time = stream_time

    def decode(self, samples: np.ndarray, sample_rate: int) -> list[Frame]:
        if samples.ndim != 2 or samples.shape[1] < 4:
            raise ValueError("logic decode expects [N, channels>=4] capture")
        if not self.enable_iso7816:
            return []
        dec = Iso7816Decoder(sample_rate, self.stream_time)
        return dec.decode(samples)

    def decode_wav(self, path: str) -> list[Frame]:
        from ..io.wav import read_wav

        samples, info = read_wav(path)
        if samples.ndim != 2:
            raise ValueError("logic capture must be multi-channel")
        return self.decode(samples, info.sample_rate)
