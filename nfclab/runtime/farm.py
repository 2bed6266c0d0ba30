"""Multi-stream TPU decode farm: N live magnitude streams decoded
concurrently with the dense phase on the device.

Production-serving configuration (the scale story the reference's desktop
thread pool cannot reach): the fused Pallas frontend conditions N streams
and produces every correlator channel plus the all-tech detect triggers
chunk-by-chunk with carried ring state — bit-identical to per-stream
monolithic passes (fused_frontend.py) — while the host runs only

- the carrier edge tracker (a 1-channel native scan; the kernel does not
  emit the edge channels),
- the lazily computed event channels that read exact conditioning (carrier
  hysteresis crossings, modulation-depth gates), and
- the per-stream event walk + protocol FSMs (O(events), not O(samples)).

One chip sustains ~10 GS/s of dense phase (bench.py), i.e. a thousand
10 MS/s streams; the host walk shards across cores/hosts with the streams
(they are independent — no collectives).

Kernel base clocks are int32: for unbounded streams the farm folds the
absolute chunk clock to ``512 + clock % 512`` (every ring size divides 512,
and the fold keeps ``t >= ETU`` so the stream-head envelope seeding never
re-triggers), so ring phases stay consistent forever while frame clocks
remain absolute int64 on the host.
"""

from __future__ import annotations

import numpy as np

from ..core.frame import Frame
from ..core.params import SignalParams
from ..dsp.tpu_channels import _BOX_KEYS, _WARMUP, idx_key_map
from .decoder import CarrierDetector, DecoderContext, walk
from .streaming import StreamingNfcDecoder

_COND_KEYS = ("envelope", "filtered", "deviation", "average", "mod_depth")


class KernelFedStream(StreamingNfcDecoder):
    """Incremental decoder whose conditioning + correlator channels arrive
    as externally computed chunks (from the fused TPU kernel); the host
    runs only the edge tracker, the lazy event channels and the walk.

    ``window=N`` bounds memory exactly like the host streaming decoder:
    only the trailing N..slack*N samples of every dense array stay
    resident, clocks stay absolute, and the kernel-fed cache entries shift
    with the window (LazyChannels.rebind handles them generically)."""

    def __init__(self, sample_rate: int, window: int | None = None,
                 **decoder_kwargs):
        super().__init__(sample_rate, window=window, **decoder_kwargs)
        self._edge_state = np.zeros(2, np.float64)
        self._box_entries: list | None = None
        self._idx_entries: list | None = None

    def feed(self, block):  # pragma: no cover - guard
        raise TypeError(
            "KernelFedStream consumes kernel chunks via feed_external(); "
            "use StreamingNfcDecoder for host-conditioned feeds"
        )

    # ----------------------------------------------------------- kernel feed

    def feed_external(
        self,
        value: np.ndarray,
        cond_chunks: dict[str, np.ndarray],
        box_chunks: dict[str, np.ndarray],
        mask_chunk: np.ndarray,
    ) -> list[Frame]:
        """Ingest one chunk: raw samples, the kernel's five conditioned
        channels, the nine box channels and the packed detect mask (all of
        equal length); returns newly completed frames."""
        assert not self._finished, "stream already finished"
        self._compact()
        m = len(value)
        self._ensure_capacity(m)
        abs_lo = self._n  # absolute clock of this chunk's first sample
        plo = abs_lo - self._base  # physical offset in the window buffers
        self._bufs["value"][plo : plo + m] = value
        for k in _COND_KEYS:
            self._bufs[k][plo : plo + m] = cond_chunks[k]
        from ..native.binding import edge_track_into

        edge_track_into(
            self.params, self._edge_state, self._bufs, plo, m, self._base
        )
        self._n += m

        full = self._view()
        if self._ctx is None:
            ctx = DecoderContext(
                full, self.sample_rate, self.params,
                self._proto.stream_time, thresholds=self._proto.thresholds,
            )
            self._ctx = ctx
            if self.window:
                ctx.channels.capacity_hint = (
                    self.slack * self.window + (1 << 17)
                )
            self._init_kernel_entries(ctx.channels)
            self._append_kernel_chunks(
                ctx.channels, box_chunks, mask_chunk, abs_lo, abs_lo + m
            )
            self._carrier = CarrierDetector(ctx)
            self._techs = self._proto._make_techs(ctx)
            for tech in self._techs:
                tech.initialize()
        else:
            ctx = self._ctx
            ctx.cond = full
            ctx.n = len(full.value)
            ctx.channels.rebind(full, self._base)
            self._append_kernel_chunks(
                ctx.channels, box_chunks, mask_chunk, abs_lo, abs_lo + m
            )
            # host-lazy entries (carrier crossings, mod-depth gates) extend
            # over the new tail; kernel-fed entries are already current
            ctx.channels.extend_all()
            self._carrier.bind(ctx)
            for tech in self._techs:
                tech.bind_channels()

        before = len(ctx.frames)
        self._t = walk(ctx, self._carrier, self._techs, self._t)
        return ctx.frames[before:]

    # ------------------------------------------------------- entry plumbing

    def _init_kernel_entries(self, lz):
        """Create the box/index cache entries the kernel feeds, BEFORE the
        techs bind (so no getter ever host-computes them)."""
        from ..dsp.pallas.fused_frontend import MASK_LAYOUT
        from ..native.binding import alloc_array

        cap = max(len(self._bufs["value"]), 4096, lz.capacity_hint)
        self._box_entries = []
        for name, (key, kind_code, width, lag) in _BOX_KEYS.items():
            lz._cache[key] = {
                "arr": alloc_array(cap, np.float32),
                "n": 0,
                "acc": np.zeros(1, np.float64),
                "idx": None,
                "scanned": 0,
                "extend": None,
                "kind": "box",
                "meta": (kind_code, width, lag),
            }
            self._box_entries.append((name, key))
        self._idx_entries = _init_idx_entries(
            lz, self.sample_rate, self.params.power_level_threshold,
            self._proto.thresholds,
        )
        lz._plan = None

    def _append_kernel_chunks(self, lz, box_chunks, mask_chunk,
                              abs_lo, abs_hi):
        """Append one chunk (absolute clocks [abs_lo, abs_hi)) into the
        kernel-fed entries; physical buffer offsets follow the window."""
        from ..dsp.channels import LazyChannels

        plo, phi = abs_lo - lz.base, abs_hi - lz.base
        for name, key in self._box_entries:
            ent = lz._entry(key)  # grows the buffer with the window
            ent["arr"][plo:phi] = box_chunks[name]
            ent["n"] = abs_hi
        _append_mask_idx(lz, self._idx_entries, mask_chunk, abs_lo, abs_hi)


def _init_idx_entries(lz, sample_rate, power_level_threshold, thresholds):
    """Create the detect-trigger index entries the kernel's packed mask
    feeds (keyed exactly as the tech FSMs request them), BEFORE the techs
    bind; returns [(mask bit weight, cache key)]."""
    from ..dsp.pallas.fused_frontend import MASK_LAYOUT

    masks = dict(MASK_LAYOUT)
    out = []
    for mname, key, fx in idx_key_map(
        sample_rate, power_level_threshold, thresholds=thresholds
    ):
        lz._cache[key] = {
            "arr": None,
            "n": 0,
            "acc": None,
            "idx": None,
            "idx_n": 0,
            "scanned": 0,
            "extend": None,
            "kind": "idx",
            "fx": fx,
        }
        out.append((masks[mname], key))
    return out


def _append_mask_idx(lz, idx_entries, mask_chunk, abs_lo, abs_hi):
    """Unpack one mask chunk (absolute clocks [abs_lo, abs_hi)) into the
    index entries, gated at the reference's 1024-sample warm-up."""
    from ..dsp.channels import LazyChannels

    bits = mask_chunk.astype(np.int32)
    if abs_lo < _WARMUP:
        bits[: min(abs_hi, _WARMUP) - abs_lo] = 0
    for weight, key in idx_entries:
        ent = lz._cache[key]
        idx = (np.flatnonzero(bits & weight) + abs_lo).astype(np.int64)
        LazyChannels._append_idx(ent, idx, abs_hi)


import functools


@functools.lru_cache(maxsize=8)
def _row_padder(b: int):
    """jitted zero-pad of [n, t] rows up to the kernel lane count b
    (device-side; the host uploads only real rows)."""
    import jax
    import jax.numpy as jnp

    def pad(x):
        return jnp.zeros((b, x.shape[1]), x.dtype).at[: x.shape[0]].set(x)

    return jax.jit(pad)


class MaskFedStream(StreamingNfcDecoder):
    """Host-conditioned streaming decoder whose detect-trigger indices
    arrive from the fused kernel's packed mask (the farm's ``fetch="mask"``
    mode: 1 byte/sample over the link instead of 37).

    Conditioning + box channels build natively on the host (the bit-exact
    f64 contract path, same as StreamingNfcDecoder); the kernel mask is
    dispatched with MASK_ONLY_MARGIN so the f32-derived triggers are a
    conservative superset of the host-f64 triggers the walk re-checks
    (same superset recipe as the batch mask frontend,
    tpu_channels._run_batch_blocks)."""

    def __init__(self, sample_rate: int, window: int | None = None,
                 **decoder_kwargs):
        super().__init__(sample_rate, window=window, **decoder_kwargs)
        self._idx_entries: list | None = None
        self._pending_mask: tuple | None = None

    def feed_mask(self, block: np.ndarray, mask_chunk: np.ndarray):
        """Condition + decode one block, detect triggers from the kernel
        mask; returns newly completed frames."""
        assert not self._finished, "stream already finished"
        self._compact()
        block = np.ascontiguousarray(block, np.float32)
        self._ensure_capacity(len(block))
        from ..native.binding import condition_stream_into

        abs_lo = self._n
        m = condition_stream_into(
            block, self.params, self._state, self._bufs,
            self._n - self._base,
        )
        self._n += m
        self._pending_mask = (mask_chunk, abs_lo, abs_lo + m)
        return self._advance()

    def _install_external(self, ctx, first: bool) -> None:
        lz = ctx.channels
        if first:
            self._idx_entries = _init_idx_entries(
                lz, self.sample_rate, self.params.power_level_threshold,
                self._proto.thresholds,
            )
            lz._plan = None
        if self._pending_mask is not None:
            mask_chunk, abs_lo, abs_hi = self._pending_mask
            self._pending_mask = None
            _append_mask_idx(lz, self._idx_entries, mask_chunk,
                             abs_lo, abs_hi)


class TpuStreamFarm:
    """Decode ``n_streams`` independent 10 MS/s magnitude streams: one
    device dispatch per chunk covers every stream's dense phase; host
    walkers emit frames per stream.

    feed(blocks[n_streams, chunk]) -> list of per-stream new frames.
    Streams that end early can be padded with zeros (silence decodes to
    carrier events only)."""

    def __init__(
        self,
        n_streams: int,
        sample_rate: int = 10_000_000,
        power_level_threshold: float = 0.01,
        window: int | None = None,
        fetch: str = "full",
        **decoder_kwargs,
    ):
        if sample_rate != 10_000_000:
            raise ValueError(
                "the fused kernel's windows are built for 10 MS/s captures"
            )
        if fetch not in ("full", "mask"):
            raise ValueError("fetch must be 'full' or 'mask'")
        self.fetch = fetch
        self.n_streams = n_streams
        self.sample_rate = sample_rate
        self.params = SignalParams(
            sample_rate, power_level_threshold=power_level_threshold
        )
        from ..dsp.frontend import _params_tuple

        from ..core.thresholds import DecoderThresholds

        self._pt = _params_tuple(self.params)
        # one DecoderThresholds governs the kernel mask params AND every
        # stream's FSM thresholds (single source of truth)
        th = decoder_kwargs.get("thresholds") or DecoderThresholds()
        decoder_kwargs["thresholds"] = th
        self._mp = th.detect_mask_tuple(power_level_threshold)
        if fetch == "mask":
            # margined kernel thresholds: the f32 mask is a conservative
            # superset of the host-f64 triggers the walk re-checks (same
            # recipe as tpu_channels._run_batch_blocks)
            from ..dsp.tpu_channels import MASK_ONLY_MARGIN

            p, a, b_deep, f, v = self._mp
            m = 1.0 - MASK_ONLY_MARGIN
            self._mp = (p, a * m, b_deep, f * m, v * m)
        cls = MaskFedStream if fetch == "mask" else KernelFedStream
        self.streams = [
            cls(
                sample_rate,
                window=window,
                power_level_threshold=power_level_threshold,
                **decoder_kwargs,
            )
            for _ in range(n_streams)
        ]
        self._state = None
        self._clock = 0

    def _kernel_base(self) -> int:
        # int32-safe fold; every ring size divides 512 and the fold keeps
        # t >= ETU so stream-head envelope seeding happens only at clock 0
        return self._clock if self._clock == 0 else 512 + (self._clock % 512)

    def feed(self, blocks: np.ndarray) -> list[list[Frame]]:
        from ..dsp.pallas.fused_frontend import LANES, TILE, fused_frontend

        blocks = np.ascontiguousarray(blocks, np.float32)
        n_s, chunk = blocks.shape
        if n_s != self.n_streams:
            raise ValueError(f"expected {self.n_streams} stream rows")
        if chunk % TILE:
            raise ValueError(f"chunk must be a multiple of {TILE}")
        b = -(-n_s // LANES) * LANES

        # explicit device_put: the implicit transfer inside jit is ~30x
        # slower than the direct path on the tunnel-attached chip.  Only
        # the REAL stream rows cross the link — as 2-byte i16 codes when
        # the samples sit on the int16 grid (bit-exact, see
        # tpu_channels.device_put_samples) — and zero-padding to the
        # kernel's lane count happens on device (padding host-side
        # uploaded b/n_s x the bytes — 268 MB/chunk of zeros for a
        # 4-stream farm — and was the entire farm bottleneck on a tunnel
        # attachment)
        from ..dsp.tpu_channels import device_put_samples

        x = device_put_samples(blocks)
        if b != n_s:
            x = _row_padder(b)(x)
        select = ("detect_mask",) if self.fetch == "mask" else None
        res, self._state = fused_frontend(
            x, self._pt, native_layout=False, mask_params=self._mp,
            state=self._state, base=self._kernel_base(), return_state=True,
            select=select,
        )
        self._clock += chunk

        # split + concurrent fetch pipelines the latency-bound device->host
        # round trips (see tpu_channels.fetch_arrays)
        from ..dsp.tpu_channels import fetch_arrays

        if self.fetch == "mask":
            # 1 byte/sample over the link: host builds conditioning + box
            # channels natively, the kernel supplies only detect triggers
            fetched = fetch_arrays({"detect_mask": res["detect_mask"][:n_s]})
            return [
                st.feed_mask(blocks[i], fetched["detect_mask"][i])
                for i, st in enumerate(self.streams)
            ]
        names = (*_COND_KEYS, *_BOX_KEYS, "detect_mask")
        fetch = fetch_arrays({name: res[name][:n_s] for name in names})
        out = []
        for i, st in enumerate(self.streams):
            cond = {k: fetch[k][i] for k in _COND_KEYS}
            boxes = {k: fetch[k][i] for k in _BOX_KEYS}
            out.append(
                st.feed_external(blocks[i], cond, boxes,
                                 fetch["detect_mask"][i])
            )
        return out

    def finish(self) -> list[list[Frame]]:
        return [st.finish() for st in self.streams]


class TpuLogicFarm:
    """Decode ``n_streams`` independent logic-analyzer streams (ISO7816):
    one batched device dispatch per chunk computes every stream's packed
    event mask (dsp/logic_frontend, per-stream carried edge state); the host
    walkers consume only the sparse event indices.

    feed(blocks[n_streams, chunk, channels]) -> per-stream new frames.
    The logic analog of TpuStreamFarm; a deployment serving both subsystems
    runs one of each (streams are independent — no collectives)."""

    def __init__(
        self,
        n_streams: int,
        sample_rate: int,
        channels: int = 4,
        stream_time: float = 0.0,
        channel_map=None,
    ):
        from .logic_decoder import StreamingIsoDecoder, normalize_channel_map

        self.n_streams = n_streams
        self.channels = channels
        # the farm permutes blocks BEFORE the batched device dispatch so
        # the event masks are computed over the decoder layout; the streams
        # then consume identity-mapped blocks + masks
        self._perm = normalize_channel_map(channel_map, channels)
        self.streams = [
            StreamingIsoDecoder(
                sample_rate, channels=channels, stream_time=stream_time
            )
            for _ in range(n_streams)
        ]
        self._carry = None

    def feed(self, blocks: np.ndarray) -> list[list[Frame]]:
        from ..dsp.logic_frontend import logic_event_mask

        blocks = np.ascontiguousarray(blocks, np.float32)
        if blocks.ndim != 3 or blocks.shape[0] != self.n_streams or (
            blocks.shape[2] != self.channels
        ):
            raise ValueError(
                f"expected [{self.n_streams}, chunk, {self.channels}] blocks"
            )
        if self._perm is not None:
            blocks = np.ascontiguousarray(blocks[:, :, self._perm])
        mask, self._carry = logic_event_mask(blocks, self._carry)
        mask = np.asarray(mask)
        return [
            st.feed(blocks[i], mask=mask[i])
            for i, st in enumerate(self.streams)
        ]

    def finish(self) -> list[list[Frame]]:
        return [st.finish() for st in self.streams]
