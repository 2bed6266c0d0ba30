"""NFC-B (ISO14443-B) demodulator.

Event-driven parity with tech/NfcB.cpp: ASK NRZ poll decode (SoF = falling
edge, 10-11 ETU of zeros, rising edge; NfcB.cpp:238-432), per-symbol edge
resynchronization (NfcB.cpp:684-762), BPSK listen path with the TR1/S1/S2
start-of-sequence state machine (NfcB.cpp:767-949) and the shared zero-cross
symbol decoder (NfcB.cpp:954-1040).  Protocol: REQB/ATTRIB (NfcB.cpp:1153-1258).

Unlike NFC-A's listen integrator, NfcB's phase integration starts right at the
poll-frame modulation clear with zeroed buffers (NfcB.cpp:790-794 runs before
the guard gate), so the telescoped phase value equals the pure box sum
PB4(t - d) with no additive constant.
"""

from __future__ import annotations

import numpy as np

from ..core import nfc
from ..core.frame import Frame, FrameFlags, FramePhase, FrameTech, FrameType
from ..core.params import nfca_bitrates
from ..protocol.crc import check_crc_nfcb
from .common import (
    BUFFER_SIZE,
    FrameStatus,
    ModulationStatus,
    StreamStatus,
    SymbolStatus,
)

F = np.float32

# pattern types (NfcB.cpp:37-47)
Invalid = 0
NoPattern = 1
PatternL = 2
PatternH = 3
PatternS = 4
PatternM = 5
PatternN = 6
PatternO = 7

# listen SoF search stages (NfcB.cpp:31-33)
LISTEN_MODE_TR1 = 0
LISTEN_MODE_SOS_S1 = 1
LISTEN_MODE_SOS_S2 = 2


class NfcBTech:
    tech_type = FrameTech.NfcBTech

    def __init__(self, ctx):
        self.ctx = ctx
        # config (NfcB.cpp:102-109; single source of truth core.thresholds,
        # defaults 0.10 / 0.90 / 0.50)
        th = ctx.thresholds.nfcb
        self.minimum_modulation_deep = F(th.min_modulation_deep)
        self.maximum_modulation_deep = F(th.max_modulation_deep)
        self.correlation_threshold = F(th.correlation)

        self.bitrates = []
        self.mod = [ModulationStatus() for _ in range(3)]
        self.symbol = SymbolStatus()
        self.stream = StreamStatus()
        self.frame = FrameStatus()
        self.protocol = FrameStatus()
        self.chained_flags = 0
        self.last_frame_end = 0
        self.max_frame_size = 256
        # NFC-B specific protocol windows (NfcB.cpp:203-214)
        self.tr1_min = 0
        self.tr1_max = 0
        self.s1_min = 0
        self.s1_max = 0
        self.s2_min = 0
        self.s2_max = 0
        self._mask_idx = []

    def initialize(self):
        """NfcB.cpp:124-233 + detect mask precomputation."""
        ctx = self.ctx
        stu = ctx.params.sample_time_unit
        self.last_frame_end = 0
        self.chained_flags = 0
        self.symbol.reset()
        self.stream.reset()
        self.frame = FrameStatus()
        # identical bitrate derivation to NFC-A (NfcB.cpp:150-201)
        self.bitrates = nfca_bitrates(ctx.sample_rate, int(FrameTech.NfcBTech))
        self.mod = [ModulationStatus() for _ in self.bitrates]

        self.protocol = FrameStatus()
        self.max_frame_size = 256
        self.protocol.start_up_guard_time = int(stu * nfc.NFCB_SFGT_DEF)
        self.protocol.frame_guard_time = int(stu * nfc.NFCB_FGT_DEF)
        self.protocol.frame_waiting_time = int(stu * nfc.NFCB_FWT_DEF)
        self.protocol.request_guard_time = int(stu * nfc.NFCB_RGT_DEF)
        self.tr1_min = int(stu * nfc.NFCB_TR1_MIN)
        self.tr1_max = int(stu * nfc.NFCB_TR1_MAX)
        self.s1_min = int(stu * nfc.NFCB_TLISTEN_S1_MIN)
        self.s1_max = int(stu * nfc.NFCB_TLISTEN_S1_MAX)
        self.s2_min = int(stu * nfc.NFCB_TLISTEN_S2_MIN)
        self.s2_max = int(stu * nfc.NFCB_TLISTEN_S2_MAX)

        self.frame.start_up_guard_time = self.protocol.start_up_guard_time
        self.frame.frame_waiting_time = self.protocol.frame_waiting_time
        self.frame.frame_guard_time = self.protocol.frame_guard_time
        self.frame.request_guard_time = self.protocol.request_guard_time

        self.bind_channels()

    def bind_channels(self):
        """Detect trigger masks for the falling edge (NfcB.cpp:283); only
        r106k/r212k participate in detection (NfcB.cpp:249).  Safe to call
        again after the conditioned stream grows (state untouched)."""
        ctx = self.ctx
        self._mask_idx = [
            ctx.channels.edge_idx_b(
                br.symbol_delay_detect,
                self.minimum_modulation_deep,
                ctx.power_level_threshold,
            )
            for br in self.bitrates[: nfc.R212K + 1]
        ]

    # ------------------------------------------------------------------ detect

    def is_dirty(self) -> bool:
        """True while any rate is mid-SoF-search (bounded, ~14 ETU); the
        walker then steps this tech per sample."""
        for mod in self.mod[: nfc.R212K + 1]:
            if (
                mod.symbol_start_time
                or mod.symbol_end_time
                or mod.detector_peak_time
                or mod.search_end_time
            ):
                return True
        return False

    def next_interesting(self, t: int) -> int | None:
        t = max(t, BUFFER_SIZE)
        cand = []
        for idx in self._mask_idx:
            i = np.searchsorted(idx, t)
            if i < len(idx):
                cand.append(int(idx[i]))
        return min(cand) if cand else None

    def detect_step(self, t: int) -> bool:
        """NfcB.cpp:238-432."""
        ctx = self.ctx
        if t < BUFFER_SIZE:
            return False
        env = ctx.cond.envelope[t]
        if env < ctx.power_level_threshold:
            return False

        filt = ctx.cond.filtered
        mdepth = ctx.cond.mod_depth

        for r in range(nfc.R212K + 1):
            br = self.bitrates[r]
            mod = self.mod[r]
            d = br.symbol_delay_detect
            u = t - d
            signal_edge = filt[u] if u >= 0 else F(0.0)
            signal_deep = mdepth[u] if u >= 0 else F(0.0)

            # recover on deep overflow or stale peak (NfcB.cpp:265-274)
            if signal_deep > self.maximum_modulation_deep or (
                mod.detector_peak_time
                and t > mod.detector_peak_time + br.period1
            ):
                mod.symbol_start_time = 0
                mod.symbol_end_time = 0
                mod.search_start_time = 0
                mod.search_end_time = 0
                mod.search_sync_time = 0
                mod.detector_peak_time = 0
                mod.detector_peak_value = 0.0

            if not mod.symbol_start_time:
                # SoF falling-edge search (NfcB.cpp:277-305)
                mod.search_value_threshold = F(env * self.minimum_modulation_deep)
                if (
                    signal_edge < -mod.search_value_threshold
                    and signal_edge < mod.detector_peak_value
                ):
                    mod.detector_peak_value = signal_edge
                    mod.detector_peak_time = t
                    mod.search_end_time = t + br.period4

                if t != mod.search_end_time:
                    continue

                mod.symbol_start_time = mod.detector_peak_time - br.period8
                mod.search_start_time = (
                    mod.symbol_start_time + 10 * br.period1 - br.period2
                )
                mod.search_end_time = (
                    mod.symbol_start_time + 11 * br.period1 + br.period2
                )
                mod.search_value_threshold = F(abs(mod.detector_peak_value * F(0.5)))
                mod.detector_peak_value = 0.0
                mod.detector_peak_time = 0
                continue

            if not mod.symbol_end_time:
                # wait 10-11 ETU of zeros, then rising edge (NfcB.cpp:308-361)
                if t < mod.search_start_time:
                    if signal_edge > mod.search_value_threshold:
                        mod.symbol_start_time = 0
                        mod.symbol_end_time = 0
                        mod.search_start_time = 0
                        mod.search_end_time = 0
                        mod.detector_peak_time = 0
                        mod.detector_peak_value = 0.0
                    continue

                if (
                    signal_edge > mod.search_value_threshold
                    and signal_edge > mod.detector_peak_value
                ):
                    mod.detector_peak_value = signal_edge
                    mod.detector_peak_time = t
                    mod.search_end_time = t + br.period4

                if t != mod.search_end_time:
                    continue

                if not mod.detector_peak_time:
                    mod.symbol_start_time = 0
                    mod.symbol_end_time = 0
                    mod.search_start_time = 0
                    mod.search_end_time = 0
                    mod.detector_peak_value = 0.0
                    continue

                mod.symbol_end_time = mod.detector_peak_time
                mod.search_start_time = (
                    mod.detector_peak_time + 2 * br.period1 - br.period2
                )
                mod.search_end_time = (
                    mod.detector_peak_time + 3 * br.period1 + br.period2
                )
                mod.search_value_threshold = F(abs(mod.detector_peak_value) / 2)
                mod.detector_peak_value = 0.0
                mod.detector_peak_time = 0
                continue

            # final falling edge 2-3 ETU after rise (NfcB.cpp:363-402)
            if t < mod.search_start_time:
                if signal_edge < -mod.search_value_threshold:
                    mod.symbol_start_time = 0
                    mod.symbol_end_time = 0
                    mod.search_start_time = 0
                    mod.search_end_time = 0
                    mod.detector_peak_time = 0
                    mod.detector_peak_value = 0.0
                continue

            if (
                signal_edge < -mod.search_value_threshold
                and mod.detector_peak_value > signal_edge
            ):
                mod.detector_peak_value = signal_edge
                mod.detector_peak_time = t
                mod.search_end_time = t + br.period4

            if t != mod.search_end_time:
                continue

            if not mod.detector_peak_time:
                mod.symbol_start_time = 0
                mod.symbol_end_time = 0
                mod.search_start_time = 0
                mod.search_end_time = 0
                mod.detector_peak_time = 0
                mod.detector_peak_value = 0.0
                break  # NfcB.cpp:401 breaks the rate loop

            # SoF complete; lock (NfcB.cpp:407-428)
            mod.symbol_end_time = mod.detector_peak_time
            mod.search_sync_time = mod.symbol_end_time + br.period2
            mod.search_start_time = 0
            mod.search_end_time = 0
            mod.search_value_threshold = F(abs(mod.detector_peak_value * F(0.5)))
            mod.detector_peak_time = 0
            mod.detector_peak_value = 0.0

            self.frame.frame_type = int(FrameType.NfcPollFrame)
            self.frame.symbol_rate = br.symbols_per_second
            self.frame.frame_start = mod.symbol_start_time - d
            self.frame.frame_end = 0

            ctx.bitrate = br
            ctx.modulation = mod
            ctx.locked_tech = self
            return True

        return False

    def reset_modulation(self):
        """NfcB.cpp:1045-1069."""
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
        (NfcB.cpp:540-556; keeps the lock for the listen phase)."""
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

    def _emit_frame(self, frame_type: int, truncated: bool):
        """Build + process a completed frame from native stream state."""
        ctx = self.ctx
        stream = self.stream
        frame = Frame(
            tech_type=int(FrameTech.NfcBTech),
            frame_type=frame_type,
            frame_rate=ctx.bitrate.symbols_per_second,
            data=bytes(stream.buffer[: stream.bytes]),
            sample_start=self.frame.frame_start,
            sample_end=self.frame.frame_end,
            sample_rate=ctx.sample_rate,
        )
        frame.time_start = self.frame.frame_start / ctx.sample_rate
        frame.time_end = self.frame.frame_end / ctx.sample_rate
        frame.date_time = ctx.stream_time + frame.time_start
        if truncated:
            frame.set_flags(FrameFlags.Truncated)
        self.process(frame)
        ctx.frames.append(frame)

    def _poll_frame_native(self, lib, t: int) -> int:
        """Native decode_poll_frame (decode_b.cpp nfclab_b_poll_frame)."""
        import ctypes

        from ..runtime import native_walk as nw

        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        st_mod = nw._pack([mod])
        sym = nw.pack_symbol(self.symbol)
        st, buf = nw.pack_stream(self.stream)
        aux = np.zeros(4, np.int64)
        t_io = np.array([t], np.int64)
        par = nw._params([br])

        code = lib.nfclab_b_poll_frame(
            nw._ptr_f32(ctx.cond.filtered),
            nw._ptr_f32(ctx.cond.mod_depth),
            ctypes.c_int64(ctx.n),
            nw._ptr_i32(par),
            nw._ptr_f64(st_mod),
            nw._ptr_f64(sym),
            ctypes.c_float(float(self.minimum_modulation_deep)),
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

        if code == nw.R_FRAME:
            self.frame.frame_end = int(aux[1])
            self._emit_frame(int(FrameType.NfcPollFrame), bool(aux[0]))
            self.stream.reset()
            self._clear_poll_modulation()
        elif code == nw.R_RESET:
            self.reset_modulation()
        return t

    def _listen_frame_native(self, lib, t: int) -> int:
        """Native decode_listen_frame (decode_b.cpp nfclab_b_listen_frame)."""
        import ctypes

        from ..runtime import native_walk as nw

        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        st_mod = nw._pack([mod])
        sym = nw.pack_symbol(self.symbol)
        st, buf = nw.pack_stream(self.stream)
        aux = np.zeros(4, np.int64)
        t_io = np.array([t], np.int64)
        par = nw._params([br])
        sos = np.array(
            [
                self.tr1_min,
                self.tr1_max,
                self.s1_min,
                self.s1_max,
                self.s2_min,
                self.s2_max,
            ],
            np.int32,
        )
        pb4 = ctx.channels.bpsk_dense(br)  # DerivedView: bp box + delay

        code = lib.nfclab_b_listen_frame(
            nw._ptr_f32(pb4.src),
            ctypes.c_int64(pb4.oa),
            nw._ptr_f32(ctx.cond.mod_depth),
            nw._ptr_f32(ctx.cond.deviation),
            ctypes.c_int64(ctx.n),
            nw._ptr_i32(par),
            nw._ptr_f64(st_mod),
            nw._ptr_f64(sym),
            nw._ptr_i32(sos),
            ctypes.c_int64(self.frame.guard_end),
            ctypes.c_int64(self.frame.waiting_end),
            ctypes.c_float(float(self.maximum_modulation_deep)),
            ctypes.c_int64(self.max_frame_size),
            ctypes.c_int32(1 if self.frame.frame_start else 0),
            nw._ptr_i64(t_io),
            nw._ptr_i64(st),
            nw._ptr_u8(buf),
            nw._ptr_i64(aux),
        )

        nw._unpack(st_mod, [mod])
        nw.unpack_symbol(sym, self.symbol)
        nw.unpack_stream(st, buf, self.stream)
        t = int(t_io[0])
        if aux[3]:
            self.frame.frame_start = int(aux[2])

        if code == nw.R_FRAME:
            # +352/fc to compensate the undetected EoS (NfcB.cpp:622)
            self.frame.frame_end = int(aux[1]) + int(
                self.ctx.params.sample_time_unit * 352
            )
            self._emit_frame(int(FrameType.NfcListenFrame), bool(aux[0]))
            self.reset_modulation()
        elif code in (nw.R_RESET, nw.R_NO_PATTERN):
            self.reset_modulation()
        return t

    # -------------------------------------------------------------- poll frame

    def decode_poll_frame(self, t: int) -> int:
        """NfcB.cpp:453-567."""
        ctx = self.ctx
        stream = self.stream
        while True:
            pattern, t = self.decode_poll_symbol_ask(t)
            if pattern <= NoPattern:
                return t

            frame_end = stream_error = truncate_error = False
            skip_symbol = False

            if stream.bits == 9 and not stream.data and pattern == PatternL:
                frame_end = True
            elif stream.bits == 9 and pattern == PatternL:
                stream_error = True
            elif stream.bits == 0 and pattern == PatternH and stream.skip == 6:
                stream_error = True
            elif stream.bytes == self.max_frame_size:
                truncate_error = True
            elif stream.bits == 0 and pattern == PatternH:
                stream.skip += 1
                skip_symbol = True

            if skip_symbol:
                continue

            if frame_end or stream_error or truncate_error:
                if stream.bytes > 2:
                    self.frame.frame_end = self.symbol.end
                    request = Frame(
                        tech_type=int(FrameTech.NfcBTech),
                        frame_type=int(FrameType.NfcPollFrame),
                        frame_rate=ctx.bitrate.symbols_per_second,
                        data=bytes(stream.buffer[: stream.bytes]),
                        sample_start=self.frame.frame_start,
                        sample_end=self.frame.frame_end,
                        sample_rate=ctx.sample_rate,
                    )
                    request.time_start = self.frame.frame_start / ctx.sample_rate
                    request.time_end = self.frame.frame_end / ctx.sample_rate
                    request.date_time = ctx.stream_time + request.time_start
                    if truncate_error or stream_error:
                        request.set_flags(FrameFlags.Truncated)

                    self.process(request)
                    ctx.frames.append(request)
                    stream.reset()

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

                self.reset_modulation()
                return t

            if stream.bits < 9:
                if stream.bits > 0:
                    stream.data |= self.symbol.value << (stream.bits - 1)
                stream.bits += 1
            else:
                stream.buffer.append(stream.data)
                stream.bytes += 1
                stream.data = 0
                stream.bits = 0
                stream.skip = 0

    def decode_poll_symbol_ask(self, t: int) -> tuple[int, int]:
        """NfcB.cpp:684-762 — NRZ symbol with edge resync."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        d = br.symbol_delay_detect
        filt = ctx.cond.filtered
        mdepth = ctx.cond.mod_depth
        n = ctx.n

        while t + 1 < n:
            t += 1
            # nothing can change before the resync window opens or sync hits
            if mod.search_start_time and t <= mod.search_start_time:
                target = min(mod.search_start_time, mod.search_sync_time - 1)
                if target > t:
                    t = target
                    continue

            u = t - d
            signal_edge = filt[u]
            signal_deep = mdepth[u]

            if mod.search_start_time < t < mod.search_end_time:
                edge = abs(signal_edge)
                if (
                    edge > mod.search_value_threshold
                    and mod.detector_peak_value < edge
                ):
                    mod.detector_peak_value = edge
                    mod.search_sync_time = t + br.period2

            if t != mod.search_sync_time:
                continue

            mod.symbol_start_time = mod.symbol_end_time
            mod.symbol_end_time = mod.search_sync_time + br.period2
            mod.search_start_time = mod.search_sync_time + br.period4
            mod.search_end_time = mod.search_start_time + br.period2
            mod.search_sync_time = mod.search_sync_time + br.period1
            mod.detector_peak_value = 0.0

            self.symbol.start = mod.symbol_start_time - d
            self.symbol.end = mod.symbol_end_time - d
            self.symbol.length = self.symbol.end - self.symbol.start
            if signal_deep > self.minimum_modulation_deep:
                self.symbol.value = 0
                self.symbol.pattern = PatternL
            else:
                self.symbol.value = 1
                self.symbol.pattern = PatternH
            return self.symbol.pattern, t

        return Invalid, t

    # ------------------------------------------------------------ listen frame

    def decode_listen_frame(self, t: int) -> int:
        """NfcB.cpp:572-679."""
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

                frame_end = stream_error = truncate_error = False
                if stream.bits == 9 and not stream.data and pattern == PatternM:
                    frame_end = True
                elif (stream.bits == 0 and pattern == PatternN) or (
                    stream.bits == 9 and pattern == PatternM
                ):
                    stream_error = True
                elif stream.bytes == self.max_frame_size:
                    truncate_error = True

                if frame_end or stream_error or truncate_error:
                    if stream.bytes > 0:
                        # +352/fc to compensate the undetected EoS
                        # (NfcB.cpp:622)
                        self.frame.frame_end = self.symbol.end + int(
                            self.ctx.params.sample_time_unit * 352
                        )
                        response = Frame(
                            tech_type=int(FrameTech.NfcBTech),
                            frame_type=int(FrameType.NfcListenFrame),
                            frame_rate=ctx.bitrate.symbols_per_second,
                            data=bytes(stream.buffer[: stream.bytes]),
                            sample_start=self.frame.frame_start,
                            sample_end=self.frame.frame_end,
                            sample_rate=ctx.sample_rate,
                        )
                        response.time_start = (
                            self.frame.frame_start / ctx.sample_rate
                        )
                        response.time_end = self.frame.frame_end / ctx.sample_rate
                        response.date_time = ctx.stream_time + response.time_start
                        if truncate_error or stream_error:
                            response.set_flags(FrameFlags.Truncated)
                        self.process(response)
                        ctx.frames.append(response)
                        self.reset_modulation()
                        return t
                    self.reset_modulation()
                    return t

                if stream.bits < 9:
                    if stream.bits > 0:
                        stream.data |= self.symbol.value << (stream.bits - 1)
                    stream.bits += 1
                else:
                    stream.buffer.append(stream.data)
                    stream.bytes += 1
                    stream.data = 0
                    stream.bits = 0
        return t

    def decode_listen_start_bpsk(self, t: int) -> tuple[int, int]:
        """NfcB.cpp:767-949 — TR1/S1/S2 start-of-sequence search."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        d = br.symbol_delay_detect
        p1, p2, p4 = br.period1, br.period2, br.period4
        pb4 = ctx.channels.bpsk_dense(br)  # phase(t) = pb4[t], no constant
        mdepth = ctx.cond.mod_depth
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
            if t > waiting_end:
                return NoPattern, t
            if mdepth[t] > self.maximum_modulation_deep:
                return NoPattern, t

            if t < mod.search_start_time:
                # the deep-abort and waiting checks precede the searchStart
                # gate (NfcB.cpp:811-825): jump only over clean spans, landing
                # on the first deep sample (whose own checks then fire)
                target = min(mod.search_start_time - 1, waiting_end, n - 1)
                nt = self._next_deep(
                    mdepth, t + 1, target + 1, self.maximum_modulation_deep
                )
                t = (nt - 1) if nt is not None else target
                continue

            phase = pb4[t]

            if phase > mod.search_value_threshold:
                if not mod.symbol_start_time:
                    mod.symbol_start_time = t
                mod.search_end_time = t + p2
            elif (
                mod.search_mode_state == LISTEN_MODE_TR1
                and not mod.symbol_start_time
            ):
                # TR1 idle: every sample with phase <= threshold is provably a
                # no-op (the switch's too-short reset resets already-zero
                # state); skip to the next candidate
                limit = min(n, waiting_end + 2)
                nt = self._next_listen_event(
                    pb4, mdepth, t + 1, limit, mod.search_value_threshold
                )
                t = (nt if nt is not None else limit) - 1
                continue

            if t != mod.search_end_time and phase > 0:
                continue

            state = mod.search_mode_state
            if state == LISTEN_MODE_TR1:
                preamble_len = t - mod.symbol_start_time
                if preamble_len < self.tr1_min or preamble_len > self.tr1_max:
                    mod.search_mode_state = LISTEN_MODE_TR1
                    mod.search_start_time = 0
                    mod.search_end_time = 0
                    mod.symbol_start_time = 0
                    mod.symbol_end_time = 0
                    continue
                mod.symbol_end_time = t
                mod.search_mode_state = LISTEN_MODE_SOS_S1
                mod.search_start_time = t + p1 + p4
                mod.search_end_time = 0
                continue

            if state == LISTEN_MODE_SOS_S1:
                s1_len = t - mod.symbol_end_time
                if s1_len < self.s1_min or s1_len > self.s1_max:
                    mod.search_mode_state = LISTEN_MODE_TR1
                    mod.search_start_time = 0
                    mod.search_end_time = 0
                    mod.symbol_start_time = 0
                    mod.symbol_end_time = 0
                    continue
                mod.symbol_end_time = t
                mod.search_mode_state = LISTEN_MODE_SOS_S2
                mod.search_start_time = t + p1 + p4
                mod.search_end_time = 0
                continue

            # LISTEN_MODE_SOS_S2
            s2_len = t - mod.symbol_end_time
            if s2_len < self.s2_min or s2_len > self.s2_max:
                mod.search_mode_state = LISTEN_MODE_TR1
                mod.search_start_time = 0
                mod.search_end_time = 0
                mod.symbol_start_time = 0
                mod.symbol_end_time = 0
                continue

            mod.symbol_end_time = t
            mod.search_sync_time = t + p2
            mod.search_last_phase = phase
            mod.search_phase_threshold = F(abs(mod.detector_peak_value * F(0.25)))
            mod.search_start_time = 0
            mod.search_end_time = 0
            mod.detector_peak_value = 0.0

            self.symbol.value = 1
            self.symbol.start = mod.symbol_start_time - p1 - d
            self.symbol.end = mod.symbol_end_time - p1 - d
            self.symbol.length = self.symbol.end - self.symbol.start
            self.symbol.pattern = PatternS
            return PatternS, t

        return Invalid, t

    @staticmethod
    def _next_deep(mdepth, t, limit, max_deep):
        """First clock in [t, limit) with mod depth above max_deep."""
        chunk = 4096
        while t < limit:
            hi = min(t + chunk, limit)
            seg = mdepth[t:hi] > max_deep
            nz = np.argmax(seg)
            if seg[nz]:
                return t + int(nz)
            t = hi
            chunk = min(chunk * 4, 1 << 20)
        return None

    def _next_listen_event(self, pb4, mdepth, t, limit, thr):
        """Idle skip helper: next clock with phase above threshold, phase at or
        below zero (state machine evaluates), or poll-modulation abort."""
        chunk = 2048
        max_deep = self.maximum_modulation_deep
        while t < limit:
            hi = min(t + chunk, limit)
            seg = (pb4[t:hi] > thr) | (mdepth[t:hi] > max_deep)
            nz = np.argmax(seg)
            if seg[nz]:
                return t + int(nz)
            t = hi
            chunk = min(chunk * 4, 1 << 20)
        return None

    def decode_listen_symbol_bpsk(self, t: int) -> tuple[int, int]:
        """NfcB.cpp:954-1040 — zero-cross resynchronized BPSK symbol."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        d = br.symbol_delay_detect
        p1, p2 = br.period1, br.period2
        pb4 = ctx.channels.bpsk_dense(br)
        n = ctx.n

        while t + 1 < n:
            t += 1
            phase = pb4[t]

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
        """NfcB.cpp:1074-1148."""
        ctx = self.ctx
        fs = self.frame

        if frame.frame_type == int(FrameType.NfcPollFrame):
            fs.start_up_guard_time = self.protocol.start_up_guard_time
            fs.frame_waiting_time = self.protocol.frame_waiting_time
            fs.frame_guard_time = self.protocol.frame_guard_time
            fs.request_guard_time = self.protocol.request_guard_time
        else:
            fs.frame_guard_time = self.protocol.frame_guard_time

        if not self.process_reqb(frame):
            if not self.process_attrib(frame):
                self.process_other(frame)

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

    def process_reqb(self, frame: Frame) -> bool:
        """NfcB.cpp:1153-1206."""
        stu = self.ctx.params.sample_time_unit
        if frame.frame_type == int(FrameType.NfcPollFrame):
            if len(frame.data) == 5 and frame.data[0] == nfc.NFCB_REQB:
                self.frame.last_command = frame.data[0]
                self.max_frame_size = 256
                self.protocol.start_up_guard_time = int(stu * nfc.NFCB_SFGT_DEF)
                self.protocol.frame_guard_time = int(stu * nfc.NFCB_FGT_DEF)
                self.protocol.frame_waiting_time = int(stu * nfc.NFCB_FWT_DEF)
                self.protocol.request_guard_time = int(stu * nfc.NFCB_RGT_DEF)
                self.frame.frame_guard_time = int(stu * nfc.NFCB_TR0_MIN)
                self.frame.frame_waiting_time = int(stu * nfc.NFCB_FWT_ATQB)
                self.chained_flags = 0
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                if not check_crc_nfcb(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        if frame.frame_type == int(FrameType.NfcListenFrame):
            if self.frame.last_command == nfc.NFCB_REQB:
                fdsi = (frame.data[10] >> 4) & 0x0F if len(frame.data) > 11 else 0
                fwi = (frame.data[11] >> 4) & 0x0F if len(frame.data) > 11 else 0
                self.max_frame_size = nfc.NFC_FDS_TABLE[fdsi]
                self.protocol.frame_waiting_time = int(
                    stu * nfc.NFC_FWT_TABLE[fwi]
                )
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                if not check_crc_nfcb(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        return False

    def process_attrib(self, frame: Frame) -> bool:
        """NfcB.cpp:1212-1258."""
        stu = self.ctx.params.sample_time_unit
        if frame.frame_type == int(FrameType.NfcPollFrame):
            if len(frame.data) > 10 and frame.data[0] == nfc.NFCB_ATTRIB:
                self.frame.last_command = frame.data[0]
                param1 = frame.data[5]
                param2 = frame.data[6]
                tr0i = (param1 >> 6) & 0x3
                fdsi = param2 & 0xF
                self.max_frame_size = nfc.NFC_FDS_TABLE[fdsi]
                if not tr0i:
                    self.protocol.frame_guard_time = int(stu * nfc.NFCB_FGT_DEF)
                else:
                    self.protocol.frame_guard_time = int(
                        stu * nfc.NFCB_TR0_MIN_TABLE[tr0i]
                    )
                self.frame.frame_waiting_time = int(stu * nfc.NFC_FWT_ACTIVATION)
                self.chained_flags = 0
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                if not check_crc_nfcb(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        if frame.frame_type == int(FrameType.NfcListenFrame):
            if self.frame.last_command == nfc.NFCB_ATTRIB:
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                return True
        return False

    def process_other(self, frame: Frame):
        """NfcB.cpp:1263-1267."""
        frame.frame_phase = int(FramePhase.NfcApplicationPhase)
        if not check_crc_nfcb(frame.data):
            frame.set_flags(FrameFlags.CrcError)
