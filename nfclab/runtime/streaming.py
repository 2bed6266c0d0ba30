"""Incremental streaming radio decoder: bounded-latency live decode.

The reference decodes live streams buffer-by-buffer with carried state
(NfcDecoder.cpp:374-442).  Here:

- conditioning runs per block through the native carry-state kernel
  (`nfclab_condition_stream`) — exact continuation of the sequential scan —
  and the outputs are appended into growable capacity buffers (amortized
  O(block), no per-feed concatenation);
- the dense channel/mask arrays extend themselves over only the new samples
  (LazyChannels is extension-aware with native f64 carries; `rebind` +
  `bind_channels` per feed cost O(block));
- the event walker resumes from its saved clock (`runtime.decoder.walk`
  returns the resume position, and every FSM already treats end-of-array as
  "wait for more samples").

Frames are emitted as soon as their final symbol lands.
"""

from __future__ import annotations

import numpy as np

from ..core.frame import Frame, FramePhase, FrameTech, FrameType
from ..core.params import SignalParams
from ..native.binding import (
    Conditioned,
    alloc_array,
    condition_stream,
    new_stream_state,
)
from .decoder import CarrierDetector, DecoderContext, NfcDecoder, walk

_KEYS = (
    "value",
    "envelope",
    "filtered",
    "deviation",
    "average",
    "mod_depth",
    "edge_peak",
    "edge_time",
)


class StreamingNfcDecoder:
    def __init__(self, sample_rate: int, **decoder_kwargs):
        self.sample_rate = sample_rate
        self.params = SignalParams(
            sample_rate,
            power_level_threshold=decoder_kwargs.get(
                "power_level_threshold", 0.01
            ),
        )
        self._proto = NfcDecoder(**decoder_kwargs)
        self._state = new_stream_state()
        cap = 1 << 17
        self._bufs = {
            k: alloc_array(cap, np.uint32 if k == "edge_time" else np.float32)
            for k in _KEYS
        }
        self._n = 0
        self._ctx: DecoderContext | None = None
        self._carrier: CarrierDetector | None = None
        self._techs: list | None = None
        self._t = 0
        self._finished = False

    @property
    def n(self) -> int:
        return self._n

    def _append(self, cond: Conditioned):
        m = len(cond.value)
        need = self._n + m
        if len(self._bufs["value"]) < need:
            cap = max(need, len(self._bufs["value"]) * 2)
            for k in _KEYS:
                new = alloc_array(
                    cap, np.uint32 if k == "edge_time" else np.float32
                )
                new[: self._n] = self._bufs[k][: self._n]
                self._bufs[k] = new
        for k in _KEYS:
            self._bufs[k][self._n : need] = getattr(cond, k)
        self._n = need

    def _view(self) -> Conditioned:
        return Conditioned(*[self._bufs[k][: self._n] for k in _KEYS])

    def feed(self, block: np.ndarray) -> list[Frame]:
        """Condition + decode one block; returns newly completed frames."""
        assert not self._finished, "stream already finished"
        block = np.ascontiguousarray(block, np.float32)
        cond = condition_stream(block, self.params, self._state)
        self._append(cond)
        return self._advance()

    def finish(self) -> list[Frame]:
        """Flush: emits the final carrier-state frame the reference produces
        on the in-band EOF buffer (NfcDecoder.cpp:448-463)."""
        out = self._advance() if self.n else []
        if not self._finished and self._ctx is not None:
            self._finished = True
            carrier_on = self._carrier.carrier_on_time if self._carrier else 0
            f = Frame(
                tech_type=int(FrameTech.NfcAnyTech),
                frame_type=int(
                    FrameType.NfcCarrierOn if carrier_on else FrameType.NfcCarrierOff
                ),
                frame_phase=int(FramePhase.NfcCarrierPhase),
                sample_start=self.n - 1,
                sample_end=self.n - 1,
                sample_rate=self.sample_rate,
            )
            f.time_start = (self.n - 1) / self.sample_rate
            f.time_end = f.time_start
            self._ctx.frames.append(f)
            out = out + [f]
        return out

    def _advance(self) -> list[Frame]:
        full = self._view()

        if self._ctx is None:
            ctx = DecoderContext(
                full, self.sample_rate, self.params, self._proto.stream_time
            )
            self._ctx = ctx
            self._carrier = CarrierDetector(ctx)
            self._techs = self._proto._make_techs(ctx)
            for tech in self._techs:
                tech.initialize()
        else:
            ctx = self._ctx
            ctx.cond = full
            ctx.n = len(full.value)
            # channel cache extends over only the new tail (O(block))
            ctx.channels.rebind(full)
            self._carrier.bind(ctx)
            for tech in self._techs:
                tech.bind_channels()

        before = len(ctx.frames)
        self._t = walk(ctx, self._carrier, self._techs, self._t)
        new = ctx.frames[before:]
        return new
