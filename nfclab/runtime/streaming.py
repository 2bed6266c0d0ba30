"""Incremental streaming radio decoder: bounded-latency live decode.

The reference decodes live streams buffer-by-buffer with carried state
(NfcDecoder.cpp:374-442).  Here:

- conditioning runs per block through the native carry-state kernel
  (`nfclab_condition_stream`) — exact continuation of the sequential scan;
- the dense channel/mask arrays are re-derived over the grown stream after
  each feed (pure functions; FSM state is untouched by `bind_channels`);
- the event walker resumes from its saved clock (`runtime.decoder.walk`
  returns the resume position, and every FSM already treats end-of-array as
  "wait for more samples").

Frames are emitted as soon as their final symbol lands.  The per-feed
channel re-derivation is O(stream) numpy work (the v1 trade-off noted in
CLAUDE.md); the conditioning itself is O(block).
"""

from __future__ import annotations

import numpy as np

from ..core.frame import Frame, FramePhase, FrameTech, FrameType
from ..core.params import SignalParams
from ..native.binding import Conditioned, condition_stream, new_stream_state
from .decoder import CarrierDetector, DecoderContext, NfcDecoder, walk


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
        self._chunks: dict[str, list[np.ndarray]] = {
            k: []
            for k in (
                "value",
                "envelope",
                "filtered",
                "deviation",
                "average",
                "mod_depth",
                "edge_peak",
                "edge_time",
            )
        }
        self._ctx: DecoderContext | None = None
        self._carrier: CarrierDetector | None = None
        self._techs: list | None = None
        self._t = 0
        self._emitted = 0
        self._finished = False

    @property
    def n(self) -> int:
        return sum(len(c) for c in self._chunks["value"])

    def feed(self, block: np.ndarray) -> list[Frame]:
        """Condition + decode one block; returns newly completed frames."""
        assert not self._finished, "stream already finished"
        block = np.ascontiguousarray(block, np.float32)
        cond = condition_stream(block, self.params, self._state)
        for k in self._chunks:
            self._chunks[k].append(getattr(cond, k))
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
        full = Conditioned(
            *[np.concatenate(self._chunks[k]) for k in self._chunks]
        )
        # collapse the chunk lists so the next concatenate is O(stream)
        for k in self._chunks:
            self._chunks[k] = [getattr(full, k)]

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
            from ..dsp.channels import LazyChannels

            ctx.channels = LazyChannels(full)
            from ..native.binding import threshold_indices

            ctx._power_idx = threshold_indices(
                full.envelope, ctx.power_level_threshold, ">="
            )
            self._carrier.bind(ctx)
            for tech in self._techs:
                tech.bind_channels()

        before = len(ctx.frames)
        self._t = walk(ctx, self._carrier, self._techs, self._t)
        new = ctx.frames[before:]
        return new
