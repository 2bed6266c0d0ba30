"""NFC-A (ISO14443-A) demodulator.

Event-driven host FSM with exact parity to the reference's per-sample machine
(tech/NfcA.cpp).  All correlation values are read from dense precomputed
channel arrays (see nfclab.dsp.channels); the FSM only visits samples where
state can change:

- detect phase: samples where |SD(t)| exceeds the correlation threshold
  (precomputed mask) plus scheduled search-window times (NfcA.cpp:217-411)
- poll decode: the [searchStart, searchEnd] window of each symbol
  (NfcA.cpp:812-934)
- listen decode: guard/waiting windows with vectorized first-crossing search,
  then fine stepping inside pulses (NfcA.cpp:939-1421)

Protocol layer (REQA/HLTA/SELn/RATS/PPS/AUTH/ISO-DEP blocks, parity/CRC,
FDT/FWT timing): NfcA.cpp:1480-1976.
"""

from __future__ import annotations

import numpy as np

from ..core import nfc
from ..core.frame import Frame, FrameFlags, FramePhase, FrameTech, FrameType
from ..core.params import nfca_bitrates
from ..protocol.crc import check_crc_nfca
from .common import (
    BUFFER_SIZE,
    FrameStatus,
    ModulationStatus,
    StreamStatus,
    SymbolStatus,
    check_parity,
    next_true,
    sd_af,
)

F = np.float32

# pattern types (NfcA.cpp:35-49)
Invalid = 0
NoPattern = 1
PatternX = 2
PatternY = 3
PatternZ = 4
PatternD = 5
PatternE = 6
PatternF = 7
PatternM = 8
PatternN = 9
PatternS = 10
PatternO = 11


class NfcATech:
    """One instance per decode run; `ctx` is a runtime.decoder.DecoderContext."""

    tech_type = FrameTech.NfcATech

    def __init__(self, ctx):
        self.ctx = ctx
        # config (NfcA.cpp:93-100; values from the single source of truth,
        # core.thresholds — defaults 0.90 / 1.00 / 0.75)
        th = ctx.thresholds.nfca
        self.minimum_modulation_deep = F(th.min_modulation_deep)
        self.maximum_modulation_deep = F(th.max_modulation_deep)
        self.correlation_threshold = F(th.correlation)

        self.bitrates = []
        self.mod = [ModulationStatus() for _ in range(3)]
        self.symbol = SymbolStatus()
        self.stream = StreamStatus()
        self.frame = FrameStatus()
        self.protocol = FrameStatus()  # reuse fields for protocolStatus
        self.chained_flags = 0
        self.last_frame_end = 0
        self._bpsk_c = F(0.0)  # telescoped BPSK integrator constant
        self._version = 0  # bumped on any detect-state mutation (scheduler cache)
        self._ni_cache = None
        # dense channels
        self._box = []  # box_value(p2) per rate (SD read on the fly)
        self._mask_idx = []  # sorted clock indices where |SD| may cross threshold
        self._deep_idx = None  # clocks where modDepth > minimumModulationDeep

    # ------------------------------------------------------------------ setup

    def initialize(self):
        """NfcA.cpp:115-212 plus dense mask precomputation."""
        ctx = self.ctx
        stu = ctx.params.sample_time_unit
        self.last_frame_end = 0
        self.chained_flags = 0
        self.symbol.reset()
        self.stream.reset()
        self.frame = FrameStatus()
        self.bitrates = nfca_bitrates(ctx.sample_rate, int(FrameTech.NfcATech))
        self.mod = [ModulationStatus() for _ in self.bitrates]

        # protocol defaults (NfcA.cpp:194-205)
        self.protocol = FrameStatus()
        self.protocol.frame_guard_time = int(stu * nfc.NFCA_FGT_DEF)
        self.protocol.frame_waiting_time = int(stu * nfc.NFCA_FWT_DEF)
        self.protocol.start_up_guard_time = int(stu * nfc.NFCA_SFGT_DEF)
        self.protocol.request_guard_time = int(stu * nfc.NFCA_RGT_DEF)
        self.max_frame_size = 256
        self.frame.start_up_guard_time = self.protocol.start_up_guard_time
        self.frame.frame_waiting_time = self.protocol.frame_waiting_time
        self.frame.frame_guard_time = self.protocol.frame_guard_time
        self.frame.request_guard_time = self.protocol.request_guard_time

        self._version += 1
        self._ni_cache = None
        self.bind_channels()

    def bind_channels(self):
        """(Re)compute dense detect channels + event masks from the current
        context arrays; FSM state is untouched (the streaming decoder calls
        this after each growth of the conditioned stream)."""
        self._version += 1
        self._ni_cache = None
        ctx = self.ctx
        ch = ctx.channels
        env = ctx.cond.envelope
        power = None
        self._box = []
        self._mask_idx = []
        for br in self.bitrates:
            box = ch.box_value(br.period2)
            idx = ch.detect_idx(
                br.symbol_delay_detect,
                br.period1,
                br.period2,
                self.correlation_threshold,
                ctx.power_level_threshold,
            )
            if idx is None:
                sd = ch.detect_sd(
                    box, br.symbol_delay_detect, br.period1, br.period2
                )
                if power is None:
                    power = env >= ctx.power_level_threshold
                mask = power & (np.abs(sd) > self.correlation_threshold * env)
                mask[:BUFFER_SIZE] = False
                idx = np.flatnonzero(mask)
            self._box.append(box)
            self._mask_idx.append(idx)
        self._deep_idx = ch.gt_idx(
            ctx.cond.mod_depth, self.minimum_modulation_deep
        )

    def debug_sd_channels(self):
        """Dense signed SD per rate for the 10-channel debug tap
        (NfcSignalDebug parity; computed on demand — the decode path reads
        SD on the fly and no longer materializes these)."""
        ch = self.ctx.channels
        return [
            ch.detect_sd(
                ch.box_value(br.period2),
                br.symbol_delay_detect,
                br.period1,
                br.period2,
            )
            for br in self.bitrates
        ]

    # ------------------------------------------------------- detect (event API)

    def is_dirty(self) -> bool:
        """NFC-A's detect schedule is fully event-driven (masks + scheduled
        windows), so it never needs per-sample stepping."""
        return False

    def next_interesting(self, t: int) -> int | None:
        """Earliest clock >= t at which detect_step could mutate state.
        Cached between detect-state mutations (the walker consults this every
        iteration; results are monotonic while state is unchanged)."""
        t = max(t, BUFFER_SIZE)
        c = self._ni_cache
        if c is not None and c[0] == self._version and c[1] <= t:
            if c[2] is None or c[2] >= t:
                return c[2]
        val = self._next_interesting_compute(t)
        self._ni_cache = (self._version, t, val)
        return val

    def _next_interesting_compute(self, t: int) -> int | None:
        cand = []
        for br, mod, idx in zip(self.bitrates, self.mod, self._mask_idx):
            i = np.searchsorted(idx, t)
            if i < len(idx):
                cand.append(int(idx[i]))
            if mod.search_end_time >= t:
                cand.append(mod.search_end_time)
            if mod.correlated_peak_time:
                nxt = self.ctx.next_power_ok(
                    max(t, mod.correlated_peak_time + br.period1 + 1)
                )
                if nxt is not None:
                    cand.append(nxt)
        return min(cand) if cand else None

    def detect_step(self, t: int) -> bool:
        """NfcA.cpp:217-411 — one sample of modulation detection."""
        ctx = self.ctx
        if t < BUFFER_SIZE:
            return False
        env = ctx.cond.envelope[t]
        if env < ctx.power_level_threshold:
            return False
        min_corr = F(env * self.correlation_threshold)

        for r, (br, mod) in enumerate(zip(self.bitrates, self.mod)):
            sd = sd_af(
                self._box[r], t, br.symbol_delay_detect, br.period1, br.period2
            )

            # recover status from previous partial search (NfcA.cpp:268-279)
            if mod.correlated_peak_time and t > mod.correlated_peak_time + br.period1:
                self._version += 1
                mod.symbol_start_time = 0
                mod.symbol_end_time = 0
                mod.search_start_time = 0
                mod.search_end_time = 0
                mod.search_sync_time = 0
                mod.detector_peak_time = 0
                mod.detector_peak_value = 0.0
                mod.correlated_peak_time = 0
                mod.correlated_peak_value = 0.0

            if t < mod.search_start_time:
                continue

            if not mod.symbol_start_time:
                # falling-edge search (NfcA.cpp:285-306)
                deep = ctx.cond.mod_depth[t - br.symbol_delay_detect - br.period8]
                if sd < -min_corr:
                    if sd < mod.correlated_peak_value:
                        self._version += 1
                        mod.correlated_peak_value = sd
                        mod.correlated_peak_time = t
                        mod.search_end_time = t + br.period4
                    if deep > mod.detector_peak_value:
                        mod.detector_peak_value = deep
                        mod.detector_peak_time = t
            else:
                # rising-edge search (NfcA.cpp:307-318)
                if sd > min_corr and sd > mod.correlated_peak_value:
                    self._version += 1
                    mod.correlated_peak_value = sd
                    mod.correlated_peak_time = t

            if t != mod.search_end_time:
                continue

            if not mod.symbol_start_time:
                # first search window closed (NfcA.cpp:324-349)
                self._version += 1
                if mod.detector_peak_value < self.minimum_modulation_deep:
                    mod.symbol_start_time = 0
                    mod.symbol_end_time = 0
                    mod.search_sync_time = 0
                    mod.search_start_time = 0
                    mod.search_end_time = 0
                    mod.search_pulse_width = 0
                    mod.correlated_peak_time = 0
                    mod.correlated_peak_value = 0.0
                    mod.detector_peak_time = 0
                    mod.detector_peak_value = 0.0
                    continue
                mod.search_sync_time = mod.correlated_peak_time + br.period2
                mod.search_start_time = mod.search_sync_time - br.period8
                mod.search_end_time = mod.search_sync_time + br.period8
                mod.symbol_start_time = mod.correlated_peak_time - br.period2
                mod.correlated_peak_time = 0
                mod.correlated_peak_value = 0.0
                continue

            # pulse measured (NfcA.cpp:352-378)
            self._version += 1
            mod.symbol_end_time = mod.correlated_peak_time
            mod.search_pulse_width = mod.symbol_end_time - mod.symbol_start_time
            min_width = br.period1 - br.period4
            max_width = br.period1 + br.period4
            if (
                mod.correlated_peak_time == 0
                or mod.detector_peak_value < self.minimum_modulation_deep
                or mod.search_pulse_width < min_width
                or mod.search_pulse_width > max_width
            ):
                mod.symbol_start_time = 0
                mod.symbol_end_time = 0
                mod.search_sync_time = 0
                mod.search_start_time = 0
                mod.search_end_time = 0
                mod.search_pulse_width = 0
                mod.correlated_peak_time = 0
                mod.correlated_peak_value = 0.0
                mod.detector_peak_time = 0
                mod.detector_peak_value = 0.0
                continue

            # modulation locked (NfcA.cpp:380-407)
            mod.search_sync_time = mod.symbol_end_time + br.period1
            mod.search_start_time = mod.search_sync_time - br.period8
            mod.search_end_time = mod.search_sync_time + br.period8
            mod.search_value_threshold = F(mod.correlated_peak_value / 2)
            mod.search_corr_0 = 0.0
            mod.search_corr_1 = 0.0
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0

            self.frame.frame_type = int(FrameType.NfcPollFrame)
            self.frame.symbol_rate = br.symbols_per_second
            self.frame.frame_start = mod.symbol_start_time - br.symbol_delay_detect
            self.frame.frame_end = 0

            self.symbol.value = 0
            self.symbol.start = mod.symbol_start_time - br.symbol_delay_detect
            self.symbol.end = mod.symbol_end_time - br.symbol_delay_detect
            self.symbol.length = self.symbol.end - self.symbol.start
            self.symbol.pattern = PatternZ

            ctx.bitrate = br
            ctx.modulation = mod
            ctx.locked_tech = self
            return True

        return False

    # --------------------------------------------------------------- reset ops

    def reset_frame_search(self):
        """NfcA.cpp:1426-1446."""
        mod = self.ctx.modulation
        if mod is not None:
            mod.symbol_start_time = 0
            mod.symbol_end_time = 0
            mod.symbol_rise_time = 0
            mod.search_sync_time = 0
            mod.search_start_time = 0
            mod.search_end_time = 0
            mod.search_pulse_width = 0
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0
            mod.detector_peak_time = 0
            mod.detector_peak_value = 0.0
        self.frame.frame_start = 0

    def reset_modulation(self):
        """NfcA.cpp:1451-1475 — full unlock back to detection."""
        self._version += 1
        for mod in self.mod:
            mod.reset()
        self.stream.reset()
        self.symbol.reset()
        self.frame.frame_type = 0
        self.frame.frame_start = 0
        self.frame.frame_end = 0
        self.ctx.bitrate = None
        self.ctx.modulation = None
        self.ctx.locked_tech = None

    # ------------------------------------------------------------ decode entry

    def decode_run(self, t: int) -> int:
        """Run the locked-tech decode loop from last-processed clock `t`;
        returns the last processed clock (NfcDecoder.cpp:420-440 dispatch +
        NfcA.cpp:416-427 decodeFrame)."""
        from ..runtime.native_walk import native_decode_lib

        lib = native_decode_lib()
        ctx = self.ctx
        while ctx.modulation is not None and t + 1 < ctx.n:
            if self.frame.frame_type == int(FrameType.NfcPollFrame):
                t = (
                    self._poll_frame_native(lib, t)
                    if lib is not None
                    else self.decode_poll_frame(t)
                )
                if ctx.modulation is None or t + 1 >= ctx.n:
                    break
            if self.frame.frame_type == int(FrameType.NfcListenFrame):
                t = (
                    self._listen_frame_native(lib, t)
                    if lib is not None
                    else self.decode_listen_frame(t)
                )
            elif self.frame.frame_type != int(FrameType.NfcPollFrame):
                break
        return t

    # ------------------------------------------------------------- native path

    def _clear_poll_modulation(self):
        """Partial modulation clear after a completed poll frame
        (NfcA.cpp:491-511; keeps the lock for the listen phase)."""
        mod = self.ctx.modulation
        if mod is not None:
            mod.symbol_start_time = 0
            mod.symbol_end_time = 0
            mod.search_mode_state = 0
            mod.search_sync_time = 0
            mod.search_start_time = 0
            mod.search_end_time = 0
            mod.search_pulse_width = 0
            mod.search_last_value = 0.0
            mod.search_last_phase = 0.0
            mod.search_value_threshold = 0.0
            mod.search_phase_threshold = 0.0
            mod.correlated_peak_value = 0.0

    def _poll_frame_native(self, lib, t: int) -> int:
        """Native decode_poll_frame (decode_a.cpp nfclab_a_poll_frame)."""
        import ctypes

        from ..runtime import native_walk as nw

        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        st_mod = nw._pack([mod])
        sym = nw.pack_symbol(self.symbol)
        st, buf = nw.pack_stream(self.stream)
        aux = np.zeros(4, np.int64)
        aux[1] = self.frame.frame_end
        t_io = np.array([t], np.int64)
        par = nw._params([br])
        box = ctx.channels.box_value(br.period2)

        code = lib.nfclab_a_poll_frame(
            nw._ptr_f32(box),
            ctypes.c_int64(ctx.n),
            nw._ptr_i32(par),
            nw._ptr_f64(st_mod),
            nw._ptr_f64(sym),
            ctypes.c_int64(self.max_frame_size),
            nw._ptr_i64(t_io),
            nw._ptr_i64(st),
            nw._ptr_u8(buf),
            nw._ptr_i64(aux),
        )

        nw._unpack(st_mod, [mod])
        nw.unpack_symbol(sym, self.symbol)
        nw.unpack_stream(st, buf, self.stream)
        t = int(t_io[0])
        self.frame.frame_end = int(aux[1])
        stream = self.stream

        if code == nw.R_FRAME:
            request = Frame(
                tech_type=int(FrameTech.NfcATech),
                frame_type=int(FrameType.NfcPollFrame),
                frame_rate=self.frame.symbol_rate,
                data=bytes(stream.buffer[: stream.bytes]),
                sample_start=self.frame.frame_start,
                sample_end=self.frame.frame_end,
                sample_rate=ctx.sample_rate,
            )
            request.time_start = self.frame.frame_start / ctx.sample_rate
            request.time_end = self.frame.frame_end / ctx.sample_rate
            request.date_time = ctx.stream_time + request.time_start
            if stream.flags & FrameFlags.ParityError:
                request.set_flags(FrameFlags.ParityError)
            if aux[0]:
                request.set_flags(FrameFlags.Truncated)
            if stream.bytes == 1 and stream.bits == 7:
                request.set_flags(FrameFlags.ShortFrame)
            self.process(request)
            ctx.frames.append(request)
            stream.reset()
            self._clear_poll_modulation()
        elif code == nw.R_RESET:
            self.reset_modulation()
        return t

    def _listen_frame_native(self, lib, t: int) -> int:
        """Native decode_listen_frame (decode_a.cpp ASK/BPSK frame loops)."""
        import ctypes

        from ..runtime import native_walk as nw

        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        st_mod = nw._pack([mod])
        sym = nw.pack_symbol(self.symbol)
        st, buf = nw.pack_stream(self.stream)
        aux = np.zeros(4, np.int64)
        aux[1] = self.frame.frame_end
        t_io = np.array([t], np.int64)
        par = nw._params([br])
        have_start = 1 if self.frame.frame_start else 0

        if br.rate_type == nfc.R106K:
            s0q = ctx.channels.corr_s0_dense(br)  # DerivedView over bq
            code = lib.nfclab_a_listen_ask_frame(
                nw._ptr_f32(s0q.src),
                ctypes.c_int64(s0q.oa),
                ctypes.c_int64(s0q.ob),
                ctypes.c_int64(s0q.lo),
                nw._ptr_f32(ctx.cond.mod_depth),
                nw._ptr_f32(ctx.cond.deviation),
                ctypes.c_int64(ctx.n),
                nw._ptr_i32(par),
                nw._ptr_f64(st_mod),
                nw._ptr_f64(sym),
                ctypes.c_int64(self.frame.guard_end),
                ctypes.c_int64(self.frame.waiting_end),
                ctypes.c_float(float(self.minimum_modulation_deep)),
                ctypes.c_int64(self.max_frame_size),
                ctypes.c_int32(have_start),
                nw._ptr_i64(t_io),
                nw._ptr_i64(st),
                nw._ptr_u8(buf),
                nw._ptr_i64(aux),
            )
            bpsk = False
        else:
            pb4 = ctx.channels.bpsk_dense(br)  # DerivedView over bp
            c_io = np.array([float(self._bpsk_c)], np.float64)
            code = lib.nfclab_a_listen_bpsk_frame(
                nw._ptr_f32(pb4.src),
                ctypes.c_int64(pb4.oa),
                nw._ptr_f32(ctx.cond.mod_depth),
                nw._ptr_f32(ctx.cond.deviation),
                ctypes.c_int64(ctx.n),
                nw._ptr_i32(par),
                nw._ptr_f64(st_mod),
                nw._ptr_f64(sym),
                ctypes.c_int64(self.frame.guard_end),
                ctypes.c_int64(self.frame.waiting_end),
                ctypes.c_float(float(self.minimum_modulation_deep)),
                ctypes.c_int32(ctx.params.elementary_time_unit),
                ctypes.c_int64(self.max_frame_size),
                ctypes.c_int32(have_start),
                nw._ptr_f64(c_io),
                nw._ptr_i64(t_io),
                nw._ptr_i64(st),
                nw._ptr_u8(buf),
                nw._ptr_i64(aux),
            )
            self._bpsk_c = F(c_io[0])
            bpsk = True

        nw._unpack(st_mod, [mod])
        nw.unpack_symbol(sym, self.symbol)
        nw.unpack_stream(st, buf, self.stream)
        t = int(t_io[0])
        self.frame.frame_end = int(aux[1])
        if aux[3]:
            self.frame.frame_start = int(aux[2])
        stream = self.stream

        if code == nw.R_FRAME:
            response = self._build_listen_frame(stream, bool(aux[0]))
            if not bpsk and stream.bytes == 1 and stream.bits == 4:
                response.set_flags(FrameFlags.ShortFrame)
            self.process(response)
            ctx.frames.append(response)
            self.reset_modulation()
        elif code == nw.R_FRAME_SEARCH:
            self.reset_frame_search()
        elif code in (nw.R_RESET, nw.R_NO_PATTERN):
            self.reset_modulation()
        return t

    # -------------------------------------------------------------- poll frame

    def decode_poll_frame(self, t: int) -> int:
        """NfcA.cpp:432-563 — returns last processed clock."""
        ctx = self.ctx
        stream = self.stream
        while True:
            pattern, t = self.decode_poll_symbol_ask(t)
            if pattern <= NoPattern:
                return t  # end of signal (Invalid); state persists

            stream.pattern = pattern
            frame_end = False
            truncate_error = False

            if stream.pattern == PatternY and stream.previous in (PatternY, PatternZ):
                frame_end = True
            elif stream.bytes == self.max_frame_size:
                truncate_error = True

            if frame_end or truncate_error:
                if stream.bytes > 0 or stream.bits == 7:
                    if stream.bits >= 7:
                        stream.buffer.append(stream.data)
                        stream.bytes += 1

                    request = Frame(
                        tech_type=int(FrameTech.NfcATech),
                        frame_type=int(FrameType.NfcPollFrame),
                        frame_rate=self.frame.symbol_rate,
                        data=bytes(stream.buffer[: stream.bytes]),
                        sample_start=self.frame.frame_start,
                        sample_end=self.frame.frame_end,
                        sample_rate=ctx.sample_rate,
                    )
                    request.time_start = self.frame.frame_start / ctx.sample_rate
                    request.time_end = self.frame.frame_end / ctx.sample_rate
                    request.date_time = ctx.stream_time + request.time_start

                    if stream.flags & FrameFlags.ParityError:
                        request.set_flags(FrameFlags.ParityError)
                    if truncate_error:
                        request.set_flags(FrameFlags.Truncated)
                    if stream.bytes == 1 and stream.bits == 7:
                        request.set_flags(FrameFlags.ShortFrame)

                    self.process(request)
                    ctx.frames.append(request)
                    stream.reset()

                    # partial modulation clear for listen phase (NfcA.cpp:491-511)
                    mod = ctx.modulation
                    if mod is not None:
                        mod.symbol_start_time = 0
                        mod.symbol_end_time = 0
                        mod.search_mode_state = 0
                        mod.search_sync_time = 0
                        mod.search_start_time = 0
                        mod.search_end_time = 0
                        mod.search_pulse_width = 0
                        mod.search_last_value = 0.0
                        mod.search_last_phase = 0.0
                        mod.search_value_threshold = 0.0
                        mod.search_phase_threshold = 0.0
                        mod.correlated_peak_value = 0.0
                    return t

                # reset modulation and restart frame detection
                self.reset_modulation()
                return t

            if self.symbol.edge:
                self.frame.frame_end = self.symbol.edge

            if stream.previous:
                value = 1 if stream.previous == PatternX else 0
                if stream.bits < 8:
                    stream.data |= value << stream.bits
                    stream.bits += 1
                elif stream.bytes < self.max_frame_size:
                    stream.buffer.append(stream.data)
                    stream.bytes += 1
                    if not check_parity(stream.data, value):
                        stream.flags |= FrameFlags.ParityError
                    stream.data = 0
                    stream.bits = 0
                else:
                    self.reset_modulation()
                    return t

            stream.previous = stream.pattern

    def decode_poll_symbol_ask(self, t: int) -> tuple[int, int]:
        """NfcA.cpp:812-934 — decode one poll symbol; returns (pattern, clock)."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        d = br.symbol_delay_detect
        p1, p2, p4, p8 = br.period1, br.period2, br.period4, br.period8
        box = ctx.channels.box_value(p2)
        n = ctx.n
        fp2 = F(p2)

        while t + 1 < n:
            t += 1
            if t < mod.search_start_time:
                t = mod.search_start_time - 1
                continue

            u = t - d
            s0 = box[u] - box[u - (p1 - p2)]
            s1 = box[u - (p1 - p2)] - box[u - 1]
            sd = abs(s0 - s1) / fp2

            if sd > mod.correlated_peak_value and sd > mod.search_value_threshold:
                mod.correlated_peak_value = sd
                mod.correlated_peak_time = t

            if t == mod.search_sync_time:
                mod.search_corr_d = sd
                mod.search_corr_0 = s0
                mod.search_corr_1 = s1

            if t != mod.search_end_time:
                continue

            # classify symbol (NfcA.cpp:876-913)
            if mod.search_corr_d < mod.search_value_threshold:
                mod.symbol_start_time = mod.symbol_end_time
                mod.symbol_end_time = mod.search_sync_time
                mod.symbol_rise_time = mod.symbol_start_time
                self.symbol.value = 1
                self.symbol.pattern = PatternY
            elif mod.search_corr_0 > mod.search_corr_1:
                mod.symbol_start_time = mod.symbol_end_time
                mod.symbol_end_time = mod.correlated_peak_time
                mod.symbol_rise_time = mod.correlated_peak_time - p2
                self.symbol.value = 0
                self.symbol.pattern = PatternZ
            else:
                mod.symbol_start_time = mod.symbol_end_time
                mod.symbol_end_time = mod.correlated_peak_time
                mod.symbol_rise_time = mod.correlated_peak_time
                self.symbol.value = 1
                self.symbol.pattern = PatternX

            mod.search_sync_time = mod.symbol_end_time + p1
            mod.search_start_time = mod.search_sync_time - p8
            mod.search_end_time = mod.search_sync_time + p8
            mod.search_corr_d = 0.0
            mod.search_corr_0 = 0.0
            mod.search_corr_1 = 0.0
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0

            self.symbol.start = mod.symbol_start_time - d
            self.symbol.end = mod.symbol_end_time - d
            self.symbol.edge = mod.symbol_rise_time - d
            self.symbol.length = self.symbol.end - self.symbol.start
            return self.symbol.pattern, t

        return Invalid, t

    # ------------------------------------------------------------ listen frame

    def decode_listen_frame(self, t: int) -> int:
        """NfcA.cpp:568-807."""
        if self.ctx.bitrate.rate_type == nfc.R106K:
            return self._decode_listen_ask(t)
        return self._decode_listen_bpsk(t)

    def _build_listen_frame(self, stream: StreamStatus, truncate_error: bool) -> Frame:
        ctx = self.ctx
        response = Frame(
            tech_type=int(FrameTech.NfcATech),
            frame_type=int(FrameType.NfcListenFrame),
            frame_rate=ctx.bitrate.symbols_per_second,
            data=bytes(stream.buffer[: stream.bytes]),
            sample_start=self.frame.frame_start,
            sample_end=self.frame.frame_end,
            sample_rate=ctx.sample_rate,
        )
        response.time_start = self.frame.frame_start / ctx.sample_rate
        response.time_end = self.frame.frame_end / ctx.sample_rate
        response.date_time = ctx.stream_time + response.time_start
        if stream.flags & FrameFlags.ParityError:
            response.set_flags(FrameFlags.ParityError)
        if truncate_error:
            response.set_flags(FrameFlags.Truncated)
        return response

    def _decode_listen_ask(self, t: int) -> int:
        """ASK listen response at 106k (NfcA.cpp:574-688)."""
        ctx = self.ctx
        stream = self.stream
        if not self.frame.frame_start:
            pattern, t = self.decode_listen_start_ask(t)
            if pattern == PatternD:
                self.frame.frame_start = self.symbol.start
            else:
                if pattern == NoPattern:
                    self.reset_modulation()
                return t

        if self.frame.frame_start:
            while True:
                pattern, t = self.decode_listen_symbol_ask(t)
                if pattern <= NoPattern:
                    return t

                frame_end = pattern == PatternF
                truncate_error = (
                    not frame_end and stream.bytes == self.max_frame_size
                )

                if frame_end or truncate_error:
                    if stream.bytes > 0 or stream.bits == 4:
                        if stream.bits == 4:
                            stream.buffer.append(stream.data)
                            stream.bytes += 1
                        response = self._build_listen_frame(stream, truncate_error)
                        if stream.bytes == 1 and stream.bits == 4:
                            response.set_flags(FrameFlags.ShortFrame)
                        self.process(response)
                        ctx.frames.append(response)
                        self.reset_modulation()
                        return t
                    # spurious SoF; retry frame search (NfcA.cpp:653)
                    self.reset_frame_search()
                    return t

                if self.symbol.edge:
                    self.frame.frame_end = self.symbol.edge

                if stream.bits < 8:
                    stream.data |= self.symbol.value << stream.bits
                    stream.bits += 1
                elif stream.bytes < self.max_frame_size:
                    stream.buffer.append(stream.data)
                    stream.bytes += 1
                    if not check_parity(stream.data, self.symbol.value):
                        stream.flags |= FrameFlags.ParityError
                    stream.data = 0
                    stream.bits = 0
                else:
                    self.reset_modulation()
                    return t
        return t

    def decode_listen_start_ask(self, t: int) -> tuple[int, int]:
        """NfcA.cpp:939-1090 — search the ASK SoF (Pattern-D)."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        d = br.symbol_delay_detect
        p1, p2, p4, p8 = br.period1, br.period2, br.period4, br.period8
        s0q = ctx.channels.corr_s0_dense(br)  # s0q[t] over clock t
        mdepth = ctx.cond.mod_depth
        n = ctx.n
        guard_end = self.frame.guard_end
        waiting_end = self.frame.waiting_end

        while t + 1 < n:
            t += 1
            # nothing observable happens before the guard (NfcA.cpp:982-984)
            if t < guard_end:
                t = guard_end - 1
                continue
            if t == guard_end:
                # minimum signal stdev as threshold (NfcA.cpp:987-988)
                mod.search_value_threshold = F(ctx.cond.deviation[t - d] * p8)
            if t > waiting_end:
                return NoPattern, t
            if mdepth[t] > self.minimum_modulation_deep:
                return NoPattern, t

            s0 = s0q[t]
            if not mod.symbol_start_time:
                if s0 > mod.search_value_threshold and s0 > mod.correlated_peak_value:
                    mod.correlated_peak_value = s0
                    mod.correlated_peak_time = t
                    mod.search_end_time = t + p4
                elif mod.correlated_peak_time == 0 and t != mod.search_end_time:
                    # idle: jump to next candidate (vectorized; visiting extra
                    # samples is a no-op so the skip target is conservative)
                    limit = min(n, waiting_end + 2)
                    nt = self._next_listen_ask_event(
                        s0q,
                        mdepth,
                        t + 1,
                        limit,
                        mod.search_value_threshold,
                        self.minimum_modulation_deep,
                    )
                    t = (nt if nt is not None else limit) - 1
                    continue
            else:
                if s0 < -mod.search_value_threshold and s0 < mod.correlated_peak_value:
                    mod.correlated_peak_value = s0
                    mod.correlated_peak_time = t

            if t != mod.search_end_time:
                continue

            if not mod.symbol_start_time:
                # first edge found (NfcA.cpp:1032-1040)
                mod.search_sync_time = mod.correlated_peak_time + p2
                mod.search_end_time = mod.search_end_time + p2
                mod.symbol_start_time = mod.correlated_peak_time - p2
                mod.correlated_peak_time = 0
                mod.correlated_peak_value = 0.0
                continue

            # pulse measured (NfcA.cpp:1042-1067)
            mod.symbol_end_time = mod.correlated_peak_time
            mod.search_pulse_width = mod.symbol_end_time - mod.symbol_start_time
            min_width = p1 - p8
            max_width = p1 + p8
            if (
                mod.correlated_peak_time == 0
                or mod.search_pulse_width < min_width
                or mod.search_pulse_width > max_width
            ):
                mod.symbol_start_time = 0
                mod.symbol_end_time = 0
                mod.search_sync_time = 0
                mod.search_start_time = 0
                mod.search_end_time = 0
                mod.search_pulse_width = 0
                mod.correlated_peak_time = 0
                mod.correlated_peak_value = 0.0
                mod.detector_peak_time = 0
                mod.detector_peak_value = 0.0
                continue

            # SoF locked (NfcA.cpp:1069-1086)
            mod.search_sync_time = mod.symbol_end_time + p1
            mod.search_start_time = mod.search_sync_time - p8
            mod.search_end_time = mod.search_sync_time + p8
            mod.search_value_threshold = F(abs(mod.correlated_peak_value * F(0.25)))
            mod.search_corr_0 = 0.0
            mod.search_corr_1 = 0.0
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0

            self.symbol.value = 1
            self.symbol.start = mod.symbol_start_time - d
            self.symbol.end = mod.symbol_end_time - d
            self.symbol.length = self.symbol.end - self.symbol.start
            self.symbol.pattern = PatternD
            return PatternD, t

        return Invalid, t

    @staticmethod
    def _next_listen_ask_event(s0q, mdepth, t, limit, thr, min_deep):
        """First clock in [t, limit) where s0q > thr or mdepth > min_deep —
        chunked scan (both are rare in the guard window).  The comparisons are
        bit-identical to the fine loop's (same arrays, same f32 ops)."""
        chunk = 2048
        while t < limit:
            hi = min(t + chunk, limit)
            seg = (s0q[t:hi] > thr) | (mdepth[t:hi] > min_deep)
            nz = np.argmax(seg)
            if seg[nz]:
                return t + int(nz)
            t = hi
            chunk = min(chunk * 4, 1 << 20)
        return None

    def decode_listen_symbol_ask(self, t: int) -> tuple[int, int]:
        """NfcA.cpp:1095-1213 — one ASK listen symbol."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        d = br.symbol_delay_detect
        p1, p2, p8 = br.period1, br.period2, br.period8
        bq = ctx.channels.box_sq(p2)
        n = ctx.n

        while t + 1 < n:
            t += 1
            if t < mod.search_start_time:
                t = mod.search_start_time - 1
                continue

            u = t - d
            s0 = bq[u] - bq[u - (p1 - p2)]
            s1 = bq[u - (p1 - p2)] - bq[u - 1]
            sd = abs(s0 - s1)

            if sd > mod.correlated_peak_value:
                mod.correlated_peak_value = sd
                mod.correlated_peak_time = t

            if t == mod.search_sync_time:
                mod.search_corr_d = sd
                mod.search_corr_0 = s0
                mod.search_corr_1 = s1

            if t != mod.search_end_time:
                continue

            if mod.search_corr_d > mod.search_value_threshold:
                mod.symbol_start_time = mod.symbol_end_time
                mod.symbol_end_time = mod.correlated_peak_time
                mod.search_value_threshold = F(mod.correlated_peak_value * F(0.25))
                if mod.search_corr_0 > mod.search_corr_1:
                    mod.symbol_rise_time = mod.search_sync_time
                    self.symbol.value = 0
                    self.symbol.pattern = PatternE
                else:
                    mod.symbol_rise_time = mod.search_sync_time - p2
                    self.symbol.value = 1
                    self.symbol.pattern = PatternD
            else:
                mod.symbol_start_time = mod.symbol_end_time
                mod.symbol_end_time = mod.search_sync_time
                mod.symbol_rise_time = 0
                self.symbol.pattern = PatternF

            mod.search_sync_time = mod.symbol_end_time + p1
            mod.search_start_time = mod.search_sync_time - p8
            mod.search_end_time = mod.search_sync_time + p8
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0

            self.symbol.start = mod.symbol_start_time - d
            self.symbol.end = mod.symbol_end_time - d
            self.symbol.edge = mod.symbol_rise_time - d
            self.symbol.length = self.symbol.end - self.symbol.start
            return self.symbol.pattern, t

        return Invalid, t

    # -------------------------------------------------------------- BPSK listen

    def _decode_listen_bpsk(self, t: int) -> int:
        """BPSK listen response at 212/424k (NfcA.cpp:690-803)."""
        ctx = self.ctx
        stream = self.stream
        if not self.frame.frame_start:
            pattern, t = self.decode_listen_start_bpsk(t)
            if pattern == PatternS:
                self.frame.frame_start = self.symbol.start
            else:
                if pattern == NoPattern:
                    self.reset_modulation()
                return t

        if self.frame.frame_start:
            while True:
                pattern, t = self.decode_listen_symbol_bpsk(t)
                if pattern <= NoPattern:
                    return t

                frame_end = pattern == PatternO
                truncate_error = (
                    not frame_end and stream.bytes == self.max_frame_size
                )

                if frame_end or truncate_error:
                    if stream.bits == 9:
                        stream.buffer.append(stream.data)
                        stream.bytes += 1
                        # last byte has even parity (NfcA.cpp:728-735)
                        if check_parity(stream.data, stream.parity):
                            stream.flags |= FrameFlags.ParityError
                    if stream.bytes > 0:
                        self.frame.frame_end = self.symbol.end
                        response = self._build_listen_frame(stream, truncate_error)
                        self.process(response)
                        ctx.frames.append(response)
                        self.reset_modulation()
                        return t
                    self.reset_modulation()
                    return t

                if stream.bits < 8:
                    stream.data |= self.symbol.value << stream.bits
                elif stream.bits < 9:
                    stream.parity = self.symbol.value
                else:
                    stream.buffer.append(stream.data)
                    stream.bytes += 1
                    if not check_parity(stream.data, stream.parity):
                        stream.flags |= FrameFlags.ParityError
                    stream.data = self.symbol.value
                    stream.bits = 0
                stream.bits += 1
        return t

    def decode_listen_start_bpsk(self, t: int) -> tuple[int, int]:
        """NfcA.cpp:1220-1329 — BPSK SoF (preamble) search."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        d = br.symbol_delay_detect
        p1, p2 = br.period1, br.period2
        pb4 = ctx.channels.bpsk_dense(br)  # PB4[t] indexed by clock
        mdepth = ctx.cond.mod_depth
        etu = ctx.params.elementary_time_unit
        n = ctx.n
        guard_end = self.frame.guard_end
        waiting_end = self.frame.waiting_end

        while t + 1 < n:
            t += 1
            if t < guard_end:
                t = guard_end - 1
                continue
            if t == guard_end:
                mod.search_value_threshold = F(ctx.cond.deviation[t - d])
                # phase integration telescopes to PB4(t) - PB4(guardEnd-1)
                self._bpsk_c = pb4[t - 1]
            if t > waiting_end:
                return NoPattern, t
            if mdepth[t] > self.minimum_modulation_deep:
                return NoPattern, t

            phase = pb4[t] - self._bpsk_c

            if phase > mod.search_value_threshold:
                if not mod.symbol_start_time:
                    mod.symbol_start_time = t
                mod.search_end_time = t + p2
            elif not mod.symbol_start_time and t != mod.search_end_time:
                # idle skip: next sample above threshold / deep / timeout
                limit = min(n, waiting_end + 2)
                nt = self._next_bpsk_event(
                    pb4,
                    mdepth,
                    t + 1,
                    limit,
                    self._bpsk_c,
                    mod.search_value_threshold,
                    self.minimum_modulation_deep,
                )
                t = (nt if nt is not None else limit) - 1
                continue

            if not mod.symbol_end_time and (
                phase < 0 or t == mod.search_end_time
            ):
                preamble_len = t - mod.symbol_start_time
                if preamble_len < etu * 3 or preamble_len > etu * 4:
                    mod.symbol_start_time = 0
                    mod.symbol_end_time = 0
                    mod.search_end_time = 0
                    continue
                mod.symbol_end_time = mod.search_end_time + p2

            if t != mod.search_end_time:
                continue

            # SoF locked (NfcA.cpp:1310-1325)
            mod.search_sync_time = mod.symbol_end_time + p2
            mod.search_last_phase = phase
            mod.search_phase_threshold = F(abs(phase * F(0.25)))
            mod.detector_peak_time = 0

            self.symbol.value = 0
            self.symbol.start = mod.symbol_start_time - p1 - d
            self.symbol.end = mod.symbol_end_time - p1 - d
            self.symbol.length = self.symbol.end - self.symbol.start
            self.symbol.pattern = PatternS
            return PatternS, t

        return Invalid, t

    @staticmethod
    def _next_bpsk_event(pb4, mdepth, t, limit, c, thr, min_deep):
        """First clock with (pb4[t]-c) > thr or mdepth > min_deep; the phase
        expression matches the fine loop's f32 ops bit-for-bit."""
        chunk = 2048
        while t < limit:
            hi = min(t + chunk, limit)
            seg = ((pb4[t:hi] - c) > thr) | (mdepth[t:hi] > min_deep)
            nz = np.argmax(seg)
            if seg[nz]:
                return t + int(nz)
            t = hi
            chunk = min(chunk * 4, 1 << 20)
        return None

    def decode_listen_symbol_bpsk(self, t: int) -> tuple[int, int]:
        """NfcA.cpp:1334-1421 — one BPSK symbol with zero-cross resync."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        d = br.symbol_delay_detect
        p1, p2 = br.period1, br.period2
        pb4 = ctx.channels.bpsk_dense(br)
        n = ctx.n
        c = self._bpsk_c

        while t + 1 < n:
            t += 1
            phase = pb4[t] - c

            if not mod.detector_peak_time:
                if (phase > 0 and mod.search_last_phase < 0) or (
                    phase < 0 and mod.search_last_phase > 0
                ):
                    mod.detector_peak_time = t
                    mod.search_sync_time = t + p2
                    mod.search_last_phase = phase

            if t != mod.search_sync_time:
                continue

            if abs(phase) < abs(mod.search_phase_threshold):
                return PatternO, t

            mod.symbol_start_time = mod.symbol_end_time
            mod.symbol_end_time = mod.search_sync_time + p2
            mod.search_sync_time = mod.search_sync_time + p1
            mod.search_last_phase = phase
            mod.detector_peak_time = 0

            if phase < -mod.search_phase_threshold:
                self.symbol.value = 1 - self.symbol.value
                self.symbol.pattern = (
                    PatternN if self.symbol.pattern == PatternM else PatternM
                )
            else:
                mod.search_phase_threshold = F(phase * F(0.25))

            self.symbol.start = mod.symbol_start_time - p1 - d
            self.symbol.end = mod.symbol_end_time - p1 - d
            self.symbol.length = self.symbol.end - self.symbol.start
            return self.symbol.pattern, t

        return Invalid, t

    # ---------------------------------------------------------------- protocol

    def process(self, frame: Frame):
        """NfcA.cpp:1480-1587 — protocol FSM + response timing update."""
        ctx = self.ctx
        stu = ctx.params.sample_time_unit
        fs = self.frame

        if frame.frame_type == int(FrameType.NfcPollFrame):
            fs.start_up_guard_time = self.protocol.start_up_guard_time
            fs.frame_waiting_time = self.protocol.frame_waiting_time
            fs.frame_guard_time = self.protocol.frame_guard_time
            fs.request_guard_time = self.protocol.request_guard_time
        else:
            fs.frame_guard_time = self.protocol.frame_guard_time

        while True:  # mimics the do { ... } while(false) dispatch
            if self.process_reqa(frame):
                break
            if self.process_hlta(frame):
                break
            if not (self.chained_flags & FrameFlags.Encrypted):
                if self.process_seln(frame):
                    break
                if self.process_rats(frame):
                    break
                if self.process_ppsr(frame):
                    break
                if self.process_auth(frame):
                    break
                if self.process_iblock(frame):
                    break
                if self.process_rblock(frame):
                    break
                if self.process_sblock(frame):
                    break
                self.process_other(frame)
            else:
                # encrypted chain: all frames opaque (NfcA.cpp:1532-1540)
                frame.clear_flags(FrameFlags.ParityError)
                frame.frame_phase = int(FramePhase.NfcApplicationPhase)
            break

        frame.set_flags(self.chained_flags)

        if frame.frame_type == int(FrameType.NfcPollFrame):
            if ctx.bitrate is not None:
                fs.guard_end = (
                    fs.frame_end + fs.frame_guard_time + ctx.bitrate.symbol_delay_detect
                )
                fs.waiting_end = (
                    fs.frame_end
                    + fs.frame_waiting_time
                    + ctx.bitrate.symbol_delay_detect
                )
                fs.frame_type = int(FrameType.NfcListenFrame)
        else:
            if ctx.bitrate is not None:
                fs.guard_end = (
                    fs.frame_end + fs.frame_guard_time + ctx.bitrate.symbol_delay_detect
                )
            fs.frame_type = 0
            fs.last_command = 0

        self.last_frame_end = fs.frame_end
        fs.frame_start = 0
        fs.frame_end = 0

    def _reset_protocol_defaults(self):
        stu = self.ctx.params.sample_time_unit
        self.max_frame_size = 256
        self.protocol.start_up_guard_time = int(stu * nfc.NFCA_SFGT_DEF)
        self.protocol.frame_guard_time = int(stu * nfc.NFCA_FGT_DEF)
        self.protocol.frame_waiting_time = int(stu * nfc.NFCA_FWT_DEF)
        self.protocol.request_guard_time = int(stu * nfc.NFCA_RGT_DEF)

    def process_reqa(self, frame: Frame) -> bool:
        """NfcA.cpp:1592-1631."""
        stu = self.ctx.params.sample_time_unit
        if frame.frame_type == int(FrameType.NfcPollFrame):
            if (
                len(frame.data) == 1
                and frame.data[0] in (nfc.NFCA_REQA, nfc.NFCA_WUPA)
            ):
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                self.frame.last_command = frame.data[0]
                self._reset_protocol_defaults()
                self.frame.frame_guard_time = int(stu * nfc.NFCA_FGT_DEF)
                self.frame.frame_waiting_time = int(stu * nfc.NFCA_FWT_ATQA)
                self.chained_flags = 0
                return True
        if frame.frame_type == int(FrameType.NfcListenFrame):
            if self.frame.last_command in (nfc.NFCA_REQA, nfc.NFCA_WUPA):
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                return True
        return False

    def process_hlta(self, frame: Frame) -> bool:
        """NfcA.cpp:1636-1665."""
        if frame.frame_type == int(FrameType.NfcPollFrame):
            if (
                len(frame.data) == 4
                and frame.data[0] == nfc.NFCA_HLTA
                and not frame.has_flags(FrameFlags.CrcError)
            ):
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                if not check_crc_nfca(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                self.frame.last_command = frame.data[0]
                self._reset_protocol_defaults()
                self.chained_flags = 0
                self.reset_modulation()
                return True
        return False

    def process_seln(self, frame: Frame) -> bool:
        """NfcA.cpp:1670-1699."""
        stu = self.ctx.params.sample_time_unit
        sels = (nfc.NFCA_SEL1, nfc.NFCA_SEL2, nfc.NFCA_SEL3)
        if frame.frame_type == int(FrameType.NfcPollFrame):
            if len(frame.data) >= 1 and frame.data[0] in sels:
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                self.frame.last_command = frame.data[0]
                self.frame.frame_guard_time = int(stu * nfc.NFCA_FGT_DEF)
                self.frame.frame_waiting_time = int(stu * nfc.NFCA_FWT_ATQA)
                return True
        if frame.frame_type == int(FrameType.NfcListenFrame):
            if self.frame.last_command in sels:
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                return True
        return False

    def process_rats(self, frame: Frame) -> bool:
        """NfcA.cpp:1704-1790."""
        stu = self.ctx.params.sample_time_unit
        if frame.frame_type == int(FrameType.NfcPollFrame):
            if len(frame.data) >= 2 and frame.data[0] == nfc.NFCA_RATS:
                fsdi = (frame.data[1] >> 4) & 0x0F
                self.frame.last_command = frame.data[0]
                self.max_frame_size = nfc.NFC_FDS_TABLE[fsdi]
                self.frame.frame_waiting_time = int(stu * nfc.NFC_FWT_ACTIVATION)
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                if not check_crc_nfca(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        if frame.frame_type == int(FrameType.NfcListenFrame):
            if self.frame.last_command == nfc.NFCA_RATS:
                offset = 0
                tl = frame.data[offset]
                offset += 1
                if tl > 0:
                    t0 = frame.data[offset]
                    offset += 1
                    if t0 & 0x10:
                        offset += 1
                    if t0 & 0x20:
                        tb = frame.data[offset]
                        offset += 1
                        sfgi = tb & 0x0F
                        fwi = (tb >> 4) & 0x0F
                        if sfgi == 15:
                            sfgi = 0
                        if fwi == 15:
                            fwi = 4
                        self.protocol.start_up_guard_time = int(
                            stu * nfc.NFC_SFGT_TABLE[sfgi]
                        )
                        self.protocol.frame_waiting_time = int(
                            stu * nfc.NFC_FWT_TABLE[fwi]
                        )
                    else:
                        self.protocol.start_up_guard_time = int(
                            stu * nfc.NFCA_SFGT_DEF
                        )
                        self.protocol.frame_waiting_time = int(stu * nfc.NFCA_FWT_DEF)
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                if not check_crc_nfca(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        return False

    def process_ppsr(self, frame: Frame) -> bool:
        """NfcA.cpp:1795-1822."""
        if frame.frame_type == int(FrameType.NfcPollFrame):
            if len(frame.data) >= 1 and (frame.data[0] & 0xF0) == nfc.NFCA_PPS:
                self.frame.last_command = frame.data[0] & 0xF0
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                if not check_crc_nfca(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        if frame.frame_type == int(FrameType.NfcListenFrame):
            if self.frame.last_command == nfc.NFCA_PPS:
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                if not check_crc_nfca(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        return False

    def process_auth(self, frame: Frame) -> bool:
        """NfcA.cpp:1827-1868 — Mifare Classic AUTH starts an encrypted chain."""
        if frame.frame_type == int(FrameType.NfcPollFrame):
            if len(frame.data) >= 1 and frame.data[0] in (
                nfc.NFCA_AUTH1,
                nfc.NFCA_AUTH2,
            ):
                self.frame.last_command = frame.data[0]
                frame.frame_phase = int(FramePhase.NfcApplicationPhase)
                if not check_crc_nfca(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        if frame.frame_type == int(FrameType.NfcListenFrame):
            if self.frame.last_command in (nfc.NFCA_AUTH1, nfc.NFCA_AUTH2):
                self.chained_flags = int(FrameFlags.Encrypted)
                frame.frame_phase = int(FramePhase.NfcApplicationPhase)
                return True
        return False

    def process_iblock(self, frame: Frame) -> bool:
        """NfcA.cpp:1873-1900."""
        if frame.frame_type == int(FrameType.NfcPollFrame):
            if (
                len(frame.data) > 4
                and (frame.data[0] & 0xE2) == nfc.NFCA_IBLOCK
            ):
                self.frame.last_command = frame.data[0] & 0xE2
                frame.frame_phase = int(FramePhase.NfcApplicationPhase)
                if not check_crc_nfca(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        if frame.frame_type == int(FrameType.NfcListenFrame):
            if self.frame.last_command == nfc.NFCA_IBLOCK:
                frame.frame_phase = int(FramePhase.NfcApplicationPhase)
                if not check_crc_nfca(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        return False

    def process_rblock(self, frame: Frame) -> bool:
        """NfcA.cpp:1905-1932."""
        if frame.frame_type == int(FrameType.NfcPollFrame):
            if (
                len(frame.data) == 3
                and (frame.data[0] & 0xE6) == nfc.NFCA_RBLOCK
            ):
                self.frame.last_command = frame.data[0] & 0xE6
                frame.frame_phase = int(FramePhase.NfcApplicationPhase)
                if not check_crc_nfca(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        if frame.frame_type == int(FrameType.NfcListenFrame):
            if self.frame.last_command == nfc.NFCA_RBLOCK:
                frame.frame_phase = int(FramePhase.NfcApplicationPhase)
                if not check_crc_nfca(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        return False

    def process_sblock(self, frame: Frame) -> bool:
        """NfcA.cpp:1937-1964."""
        if frame.frame_type == int(FrameType.NfcPollFrame):
            if (
                len(frame.data) == 4
                and (frame.data[0] & 0xC7) == nfc.NFCA_SBLOCK
            ):
                self.frame.last_command = frame.data[0] & 0xC7
                frame.frame_phase = int(FramePhase.NfcApplicationPhase)
                if not check_crc_nfca(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        if frame.frame_type == int(FrameType.NfcListenFrame):
            if self.frame.last_command == nfc.NFCA_SBLOCK:
                frame.frame_phase = int(FramePhase.NfcApplicationPhase)
                if not check_crc_nfca(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        return False

    def process_other(self, frame: Frame):
        """NfcA.cpp:1969-1973."""
        frame.frame_phase = int(FramePhase.NfcApplicationPhase)
        if not check_crc_nfca(frame.data):
            frame.set_flags(FrameFlags.CrcError)
