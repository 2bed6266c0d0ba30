"""NFC-V (ISO15693) demodulator.

Event-driven parity with tech/NfcV.cpp: pulse-position modulation at a single
base rate (fc/256 symbols), with 1-of-4 (2-bit) and 1-of-256 (8-bit) slot
codes (NfcV.cpp:220-234), SOF code discrimination (NfcV.cpp:236-435), PPM slot
search (NfcV.cpp:672-795), and a single-subcarrier ASK listen path with a two
burst SOF preamble (NfcV.cpp:800-1074).

Channel notes: the detect/poll correlator is sign-reversed relative to NFC-A:
S0(t) = (B2v(t-d-(p1-p2)) - B2v(t-d)) / p2 (NfcV.cpp:274).  The listen path
integrates filtered^2*10 over a FULL symbol (p1) into a p0-cycle ring:
S0q(t) = B1q(t-d-(p0-p1)) - B1q(t-d) (NfcV.cpp:825-835).
"""

from __future__ import annotations

import numpy as np

from ..core import nfc
from ..core.frame import Frame, FrameFlags, FramePhase, FrameTech, FrameType
from ..core.params import BUFFER_SIZE as RING, BitrateParams
from ..protocol.crc import check_crc_nfcv
from .common import (
    BUFFER_SIZE,
    sd_v,
    FrameStatus,
    ModulationStatus,
    StreamStatus,
    SymbolStatus,
)

F = np.float32

# pattern types (NfcV.cpp:36-46)
Invalid = 0
NoPattern = 1
Pattern0 = 2
Pattern1 = 3
Pattern2 = 4
Pattern8 = 5
PatternS = 6
PatternE = 7

LISTEN_MODE_PREAMBLE1 = 0
LISTEN_MODE_PREAMBLE2 = 1


class PulseParams:
    """1-of-N pulse slot table (NfcV.cpp:220-234)."""

    def __init__(self, stu: float, bits: int):
        self.bits = bits
        self.periods = 1 << bits
        self.length = int(round(self.periods * stu * 256))
        self.slots = [
            (int(round(i * stu * 256)), int(round((i + 1) * stu * 256)), i)
            for i in range(self.periods)
        ]


def nfcv_bitrate(sample_rate: int) -> BitrateParams:
    """NfcV.cpp:150-173 — single fc/256 symbol rate; delay = period0."""
    stu = float(sample_rate) / nfc.NFC_FC
    p0 = int(round(stu * 512))
    return BitrateParams(
        tech_type=int(FrameTech.NfcVTech),
        rate_type=0,
        symbols_per_second=int(round(nfc.NFC_FC / 256)),
        period0=p0,
        period1=int(round(stu * 256)),
        period2=int(round(stu * 128)),
        period4=int(round(stu * 64)),
        period8=int(round(stu * 32)),
        symbol_delay_detect=p0,
        offset_future=RING,
        offset_signal=RING - p0,
    )


class NfcVTech:
    tech_type = FrameTech.NfcVTech

    def __init__(self, ctx):
        self.ctx = ctx
        # config (NfcV.cpp:100-107; single source of truth core.thresholds,
        # defaults 0.90 / 1.00 / 0.50)
        th = ctx.thresholds.nfcv
        self.minimum_modulation_deep = F(th.min_modulation_deep)
        self.maximum_modulation_deep = F(th.max_modulation_deep)
        self.correlation_threshold = F(th.correlation)

        self.bitrate = None
        self.pulse_params = []
        self.pulse = None
        self.mod = ModulationStatus()
        self.symbol = SymbolStatus()
        self.stream = StreamStatus()
        self.frame = FrameStatus()
        self.protocol = FrameStatus()
        self.chained_flags = 0
        self.last_frame_end = 0
        self.max_frame_size = 256
        self.sof_s1_min = 0
        self.sof_s1_max = 0
        self.sof_s2_min = 0
        self.sof_s2_max = 0
        self._box = None
        self._mask_idx = None

    def initialize(self):
        """NfcV.cpp:119-218 + dense channels."""
        ctx = self.ctx
        stu = ctx.params.sample_time_unit
        self.last_frame_end = 0
        self.chained_flags = 0
        self.symbol.reset()
        self.stream.reset()
        self.frame = FrameStatus()
        self.mod = ModulationStatus()
        self.bitrate = nfcv_bitrate(ctx.sample_rate)
        self.pulse_params = [PulseParams(stu, 2), PulseParams(stu, 8)]
        self.pulse = None

        self.protocol = FrameStatus()
        self.max_frame_size = 256
        self.protocol.start_up_guard_time = int(stu * nfc.NFCV_SFGT_DEF)
        self.protocol.frame_guard_time = int(stu * nfc.NFCV_FGT_DEF)
        self.protocol.frame_waiting_time = int(stu * nfc.NFCV_FWT_DEF)
        self.protocol.request_guard_time = int(stu * nfc.NFCV_RGT_DEF)
        self.sof_s1_min = int(stu * (nfc.NFCV_TLISTEN_S1 - 32))
        self.sof_s1_max = int(stu * (nfc.NFCV_TLISTEN_S1 + 32))
        self.sof_s2_min = int(stu * (nfc.NFCV_TLISTEN_S2 - 32))
        self.sof_s2_max = int(stu * (nfc.NFCV_TLISTEN_S2 + 32))

        self.frame.start_up_guard_time = self.protocol.start_up_guard_time
        self.frame.frame_waiting_time = self.protocol.frame_waiting_time
        self.frame.frame_guard_time = self.protocol.frame_guard_time
        self.frame.request_guard_time = self.protocol.request_guard_time

        self.bind_channels()

    def bind_channels(self):
        """Detect channel: S0(t) = (B2v(t-d-(p1-p2)) - B2v(t-d)) / p2, read on
        the fly from the box channel (demod.common.sd_v)."""
        ctx = self.ctx
        br = self.bitrate
        box = ctx.channels.box_value(br.period2)
        d = br.symbol_delay_detect
        self._box = box
        idx = ctx.channels.detect_idx(
            d,
            br.period1,
            br.period2,
            self.correlation_threshold,
            ctx.power_level_threshold,
            signed_v=True,
        )
        if idx is not None:
            self._mask_idx = idx
            return
        n = len(box)
        gap = br.period1 - br.period2
        sd = np.zeros(n, np.float32)
        lo = d + br.period1
        sd[lo:] = (box[lo - d - gap : n - d - gap] - box[lo - d : n - d]) / np.float32(
            br.period2
        )

        env = ctx.cond.envelope
        power = env >= ctx.power_level_threshold
        mask = power & (sd > self.correlation_threshold * env)
        mask[:BUFFER_SIZE] = False
        self._mask_idx = np.flatnonzero(mask)

    def debug_sd_channels(self):
        """Dense detect S0 for the debug tap (reversed-difference form)."""
        br = self.bitrate
        box = self.ctx.channels.box_value(br.period2)
        n = len(box)
        d = br.symbol_delay_detect
        gap = br.period1 - br.period2
        sd = np.zeros(n, np.float32)
        lo = d + br.period1
        sd[lo:] = (
            box[lo - d - gap : n - d - gap] - box[lo - d : n - d]
        ) / np.float32(br.period2)
        return [sd]

    # ------------------------------------------------------------------ detect

    def is_dirty(self) -> bool:
        """True while mid-SOF-search (bounded, ~4 symbol periods)."""
        mod = self.mod
        return bool(
            mod.symbol_start_time or mod.correlated_peak_time or mod.search_end_time
        )

    def next_interesting(self, t: int) -> int | None:
        t = max(t, BUFFER_SIZE)
        i = np.searchsorted(self._mask_idx, t)
        if i < len(self._mask_idx):
            return int(self._mask_idx[i])
        return None

    def detect_step(self, t: int) -> bool:
        """NfcV.cpp:236-435."""
        ctx = self.ctx
        if t < BUFFER_SIZE:
            return False
        env = ctx.cond.envelope[t]
        if env < ctx.power_level_threshold:
            return False

        br = self.bitrate
        mod = self.mod
        d = br.symbol_delay_detect
        min_corr = F(env * self.correlation_threshold)
        s0 = sd_v(self._box, t, d, br.period1, br.period2)
        signal_deep = ctx.cond.mod_depth[t - d - br.period8]

        # recover from stale peak (NfcV.cpp:287-298)
        if mod.correlated_peak_time and t > mod.correlated_peak_time + br.period0:
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
            return False

        if s0 > min_corr:
            if s0 > mod.correlated_peak_value:
                mod.correlated_peak_value = s0
                mod.correlated_peak_time = t
                mod.search_end_time = t + br.period4
            if signal_deep > mod.detector_peak_value:
                mod.detector_peak_value = signal_deep
                mod.detector_peak_time = t

        if t != mod.search_end_time:
            return False

        # pulse validity: signal must be back high (NfcV.cpp:327-342)
        signal_data = ctx.cond.value[t - d]
        if (
            signal_data < min_corr
            or mod.correlated_peak_time == 0
            or mod.detector_peak_value < self.minimum_modulation_deep
        ):
            mod.symbol_start_time = 0
            mod.symbol_end_time = 0
            mod.search_start_time = 0
            mod.search_end_time = 0
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0
            mod.detector_peak_time = 0
            mod.detector_peak_value = 0.0
            return False

        if not mod.symbol_start_time:
            # first SOF pulse (NfcV.cpp:345-359)
            mod.symbol_start_time = mod.correlated_peak_time - br.period2
            mod.search_start_time = mod.symbol_start_time + 2 * br.period1
            mod.search_end_time = mod.symbol_start_time + 4 * br.period1
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0
            mod.detector_peak_time = 0
            mod.detector_peak_value = 0.0
            return False

        # second pulse discriminates the code (NfcV.cpp:362-432)
        peak = mod.correlated_peak_time
        if (
            mod.symbol_start_time + 3 * br.period1 - br.period8
            < peak
            < mod.symbol_start_time + 3 * br.period1 + br.period8
        ):
            mod.symbol_end_time = peak + br.period1
            mod.search_sync_time = mod.symbol_end_time
            mod.search_start_time = mod.search_sync_time
            mod.search_end_time = mod.search_sync_time + self.pulse_params[0].length
            self.frame.symbol_rate = br.symbols_per_second // 2
            self.pulse = self.pulse_params[0]
        elif (
            mod.symbol_start_time + 4 * br.period1 - br.period8
            < peak
            < mod.symbol_start_time + 4 * br.period1 + br.period8
        ):
            mod.symbol_end_time = peak
            mod.search_sync_time = mod.symbol_end_time
            mod.search_start_time = mod.search_sync_time
            mod.search_end_time = mod.search_sync_time + self.pulse_params[1].length
            self.frame.symbol_rate = br.symbols_per_second // 32
            self.pulse = self.pulse_params[1]
        else:
            mod.symbol_start_time = 0
            mod.symbol_end_time = 0
            mod.search_start_time = 0
            mod.search_end_time = 0
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0
            mod.detector_peak_time = 0
            mod.detector_peak_value = 0.0
            return False

        self.frame.frame_type = int(FrameType.NfcPollFrame)
        self.frame.frame_start = mod.symbol_start_time - d
        self.frame.frame_end = 0

        mod.correlated_peak_time = 0
        mod.correlated_peak_value = 0.0
        mod.search_value_threshold = min_corr

        ctx.bitrate = br
        ctx.modulation = mod
        ctx.locked_tech = self
        return True

    def reset_modulation(self):
        """NfcV.cpp:1079-1103."""
        self.stream.reset()
        self.symbol.reset()
        self.mod.reset()
        self.frame.frame_type = 0
        self.frame.frame_start = 0
        self.frame.frame_end = 0
        self.pulse = None
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
        (NfcV.cpp:530-545; keeps the lock for the listen phase)."""
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

    def _emit_frame(self, frame_type: int, frame_end: int, truncated: bool):
        """Build + process a completed frame from native stream state."""
        ctx = self.ctx
        stream = self.stream
        self.frame.frame_end = frame_end
        frame = Frame(
            tech_type=int(FrameTech.NfcVTech),
            frame_type=frame_type,
            frame_rate=self.frame.symbol_rate,
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
        """Native decode_poll_frame (decode_v.cpp nfclab_v_poll_frame)."""
        import ctypes

        from ..runtime import native_walk as nw

        ctx = self.ctx
        mod = ctx.modulation
        st_mod = nw._pack([mod])
        sym = nw.pack_symbol(self.symbol)
        st, buf = nw.pack_stream(self.stream)
        aux = np.zeros(4, np.int64)
        t_io = np.array([t], np.int64)
        par = nw._params([self.bitrate])
        pulse = self.pulse
        slot_ends = np.array([s[1] for s in pulse.slots], np.int32)

        code = lib.nfclab_v_poll_frame(
            nw._ptr_f32(self._box),
            ctypes.c_int64(ctx.n),
            nw._ptr_i32(par),
            nw._ptr_f64(st_mod),
            nw._ptr_f64(sym),
            ctypes.c_int32(pulse.bits),
            ctypes.c_int32(pulse.length),
            ctypes.c_int32(pulse.periods),
            nw._ptr_i32(slot_ends),
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
            self._emit_frame(
                int(FrameType.NfcPollFrame), int(aux[1]), bool(aux[0])
            )
            self.stream.reset()
            self._clear_poll_modulation()
        elif code == nw.R_RESET:
            self.reset_modulation()
        return t

    def _listen_frame_native(self, lib, t: int) -> int:
        """Native decode_listen_frame (decode_v.cpp nfclab_v_listen_frame)."""
        import ctypes

        from ..runtime import native_walk as nw

        ctx = self.ctx
        mod = ctx.modulation
        st_mod = nw._pack([mod])
        sym = nw.pack_symbol(self.symbol)
        st, buf = nw.pack_stream(self.stream)
        aux = np.zeros(4, np.int64)
        t_io = np.array([t], np.int64)
        par = nw._params([self.bitrate])
        sof = np.array(
            [self.sof_s1_min, self.sof_s1_max, self.sof_s2_min, self.sof_s2_max],
            np.int32,
        )
        s0q = ctx.channels.nfcv_listen_dense(self.bitrate)  # DerivedView

        code = lib.nfclab_v_listen_frame(
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
            nw._ptr_i32(sof),
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
            self._emit_frame(
                int(FrameType.NfcListenFrame), int(aux[1]), bool(aux[0])
            )
            self.reset_modulation()
        elif code in (nw.R_RESET, nw.R_NO_PATTERN):
            self.reset_modulation()
        return t

    # -------------------------------------------------------------- poll frame

    def decode_poll_frame(self, t: int) -> int:
        """NfcV.cpp:450-556."""
        ctx = self.ctx
        stream = self.stream
        while True:
            pattern, t = self.decode_poll_symbol_ppm(t)
            if pattern <= NoPattern:
                return t

            frame_end = pattern == PatternS
            stream_error = not frame_end and pattern == PatternE
            truncate_error = (
                not frame_end
                and not stream_error
                and stream.bytes == self.max_frame_size
            )

            if frame_end or stream_error or truncate_error:
                if stream.bytes > 0:
                    if stream.bits == 8:
                        stream.buffer.append(stream.data)
                        stream.bytes += 1
                    self.frame.frame_end = self.symbol.end
                    request = Frame(
                        tech_type=int(FrameTech.NfcVTech),
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

            # byte store before bit append (NfcV.cpp:541-551)
            if stream.bits == 8:
                stream.buffer.append(stream.data)
                stream.bytes += 1
                stream.data = 0
                stream.bits = 0

            stream.data |= self.symbol.value << stream.bits
            stream.bits += self.pulse.bits

    def decode_poll_symbol_ppm(self, t: int) -> tuple[int, int]:
        """NfcV.cpp:672-795 — find the pulse slot within the symbol window."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        pulse = self.pulse
        d = br.symbol_delay_detect
        box = self._box
        p1, p2 = br.period1, br.period2
        n = ctx.n

        while t + 1 < n:
            t += 1
            if t < mod.search_start_time:
                t = mod.search_start_time - 1
                continue

            s0 = sd_v(box, t, d, p1, p2)

            if s0 > mod.search_value_threshold:
                if s0 > mod.correlated_peak_value:
                    mod.correlated_peak_value = s0
                    mod.correlated_peak_time = t
                    mod.search_end_time = t + br.period4
            elif mod.correlated_peak_time == 0 and t != mod.search_end_time:
                # idle within the slot window: skip to next candidate
                nt = self._next_above(
                    box, t + 1, min(mod.search_end_time, n),
                    mod.search_value_threshold, d, p1, p2,
                )
                t = (nt if nt is not None else min(mod.search_end_time, n)) - 1
                continue

            if t != mod.search_end_time:
                continue

            # EOF: pulse in first part of second slot (NfcV.cpp:734-751)
            if (
                mod.search_start_time + br.period1 + br.period4
                < mod.correlated_peak_time
                < mod.search_start_time + 2 * br.period1 - br.period4
            ):
                mod.symbol_end_time = mod.correlated_peak_time + br.period2
                self.symbol.value = 0
                self.symbol.start = mod.symbol_start_time - d
                self.symbol.end = mod.symbol_end_time - d
                self.symbol.length = self.symbol.end - self.symbol.start
                self.symbol.pattern = PatternS
                return PatternS, t

            # default: pulse error
            self.symbol.value = 0
            self.symbol.start = mod.symbol_start_time - d
            self.symbol.end = mod.symbol_end_time - d
            self.symbol.length = self.symbol.end - self.symbol.start
            self.symbol.pattern = PatternE

            for slot_start, slot_end, slot_value in pulse.slots:
                if (
                    mod.search_start_time + slot_end - br.period4
                    < mod.correlated_peak_time
                    < mod.search_start_time + slot_end + br.period4
                ):
                    mod.symbol_start_time = mod.correlated_peak_time - slot_end
                    mod.symbol_end_time = mod.symbol_start_time + pulse.length
                    mod.search_sync_time = mod.symbol_end_time
                    mod.search_start_time = mod.search_sync_time
                    mod.search_end_time = mod.search_sync_time + pulse.length
                    mod.correlated_peak_time = 0
                    mod.correlated_peak_value = 0.0

                    self.symbol.value = slot_value
                    self.symbol.start = mod.symbol_start_time - d
                    self.symbol.end = mod.symbol_end_time - d
                    self.symbol.length = self.symbol.end - self.symbol.start
                    self.symbol.pattern = Pattern2 if pulse.bits == 2 else Pattern8
                    return self.symbol.pattern, t

            return PatternE, t

        return Invalid, t

    @staticmethod
    def _next_above(box, t, limit, thr, d, p1, p2):
        """First clock with SD > thr; SD computed from the box channel
        chunk-wise with the same f32 op order as the per-sample read."""
        gap = p1 - p2
        fp2 = F(p2)
        t = max(t, d + p1)
        chunk = 2048
        while t < limit:
            hi = min(t + chunk, limit)
            a0 = box[t - d - gap : hi - d - gap]
            a1 = box[t - d : hi - d]
            seg = ((a0 - a1) / fp2) > thr
            nz = np.argmax(seg)
            if seg[nz]:
                return t + int(nz)
            t = hi
            chunk = min(chunk * 4, 1 << 20)
        return None

    # ------------------------------------------------------------ listen frame

    def decode_listen_frame(self, t: int) -> int:
        """NfcV.cpp:561-667."""
        ctx = self.ctx
        stream = self.stream
        if not self.frame.frame_start:
            pattern, t = self.decode_listen_start_ask(t)
            if pattern == PatternS:
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

                frame_end = pattern == PatternS
                stream_error = not frame_end and pattern == PatternE
                truncate_error = (
                    not frame_end
                    and not stream_error
                    and stream.bytes == self.max_frame_size
                )

                if frame_end or stream_error or truncate_error:
                    if stream.bytes > 0:
                        if stream.bits == 8:
                            stream.buffer.append(stream.data)
                            stream.bytes += 1
                        self.frame.frame_end = self.symbol.end
                        response = Frame(
                            tech_type=int(FrameTech.NfcVTech),
                            frame_type=int(FrameType.NfcListenFrame),
                            frame_rate=self.frame.symbol_rate,
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

                if stream.bits == 8:
                    stream.buffer.append(stream.data)
                    stream.bytes += 1
                    stream.data = 0
                    stream.bits = 0

                stream.data |= self.symbol.value << stream.bits
                stream.bits += 1
        return t

    def decode_listen_start_ask(self, t: int) -> tuple[int, int]:
        """NfcV.cpp:800-980 — two-burst SOF preamble search."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        d = br.symbol_delay_detect
        p0, p1, p2, p4, p8 = br.period0, br.period1, br.period2, br.period4, br.period8
        s0q = ctx.channels.nfcv_listen_dense(br)
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
                # max deep for NFC-V is 1.0 (never exceeded), safe to jump
                t = min(mod.search_start_time - 1, waiting_end)
                continue

            s0 = s0q[t]

            if s0 < -mod.search_value_threshold and s0 < mod.correlated_peak_value:
                mod.correlated_peak_value = s0
                mod.correlated_peak_time = t
                mod.search_end_time = t + p8
            if s0 > mod.search_value_threshold and s0 > mod.correlated_peak_value:
                mod.correlated_peak_value = s0
                mod.correlated_peak_time = t
                mod.search_end_time = t + p8
            if (
                mod.correlated_peak_time == 0
                and t != mod.search_end_time
                and not mod.symbol_start_time
                and mod.search_mode_state == LISTEN_MODE_PREAMBLE1
            ):
                # idle: skip to next |s0| above threshold
                limit = min(n, waiting_end + 2)
                nt = self._next_abs_above(
                    s0q, t + 1, limit, mod.search_value_threshold
                )
                t = (nt if nt is not None else limit) - 1
                continue

            if t != mod.search_end_time:
                continue

            if mod.search_mode_state == LISTEN_MODE_PREAMBLE1:
                if not mod.symbol_start_time:
                    # first burst edge (NfcV.cpp:898-907)
                    mod.symbol_start_time = mod.correlated_peak_time - p1
                    mod.search_start_time = mod.correlated_peak_time + p0
                    mod.search_end_time = mod.search_start_time + p1
                    mod.correlated_peak_value = 0.0
                    mod.correlated_peak_time = 0
                    continue

                mod.symbol_end_time = mod.correlated_peak_time
                s1_len = mod.symbol_end_time - mod.symbol_start_time - p1
                if (
                    mod.correlated_peak_time == 0
                    or s1_len < self.sof_s1_min
                    or s1_len > self.sof_s1_max
                ):
                    mod.search_mode_state = LISTEN_MODE_PREAMBLE1
                    mod.search_start_time = 0
                    mod.search_end_time = 0
                    mod.symbol_start_time = 0
                    mod.symbol_end_time = 0
                    continue

                mod.search_mode_state = LISTEN_MODE_PREAMBLE2
                mod.search_start_time = mod.correlated_peak_time + p1 - p2
                mod.search_end_time = mod.search_start_time + p1
                mod.correlated_peak_value = 0.0
                mod.correlated_peak_time = 0
                continue

            # LISTEN_MODE_PREAMBLE2 (NfcV.cpp:937-975)
            s2_len = mod.correlated_peak_time - mod.symbol_end_time
            if (
                mod.correlated_peak_time == 0
                or s2_len < self.sof_s2_min
                or s2_len > self.sof_s2_max
            ):
                mod.search_mode_state = LISTEN_MODE_PREAMBLE1
                mod.search_start_time = 0
                mod.search_end_time = 0
                mod.symbol_start_time = 0
                mod.symbol_end_time = 0
                continue

            mod.symbol_end_time = mod.correlated_peak_time
            mod.search_sync_time = mod.symbol_end_time + p0
            mod.search_start_time = mod.search_sync_time - p4
            mod.search_end_time = mod.search_sync_time + p4
            mod.search_value_threshold = F(mod.correlated_peak_value * 0.25)
            mod.search_corr_0 = 0.0
            mod.search_corr_1 = 0.0
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0

            self.symbol.value = 0
            self.symbol.start = mod.symbol_start_time - d
            self.symbol.end = mod.symbol_end_time - d
            self.symbol.length = self.symbol.end - self.symbol.start
            self.symbol.pattern = PatternS
            return PatternS, t

        return Invalid, t

    @staticmethod
    def _next_abs_above(arr, t, limit, thr):
        chunk = 2048
        while t < limit:
            hi = min(t + chunk, limit)
            seg = (arr[t:hi] > thr) | (arr[t:hi] < -thr)
            nz = np.argmax(seg)
            if seg[nz]:
                return t + int(nz)
            t = hi
            chunk = min(chunk * 4, 1 << 20)
        return None

    def decode_listen_symbol_ask(self, t: int) -> tuple[int, int]:
        """NfcV.cpp:985-1074 — one Manchester-coded listen symbol."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        d = br.symbol_delay_detect
        p0, p4 = br.period0, br.period4
        s0q = ctx.channels.nfcv_listen_dense(br)
        n = ctx.n

        while t + 1 < n:
            t += 1
            if t < mod.search_start_time:
                t = mod.search_start_time - 1
                continue

            s0 = s0q[t]
            sd_val = abs(s0)

            if sd_val > mod.search_value_threshold and sd_val > mod.correlated_peak_value:
                mod.search_corr_0 = s0
                mod.search_corr_1 = -s0
                mod.correlated_peak_value = sd_val
                mod.symbol_end_time = t

            if t != mod.search_end_time:
                continue

            if mod.correlated_peak_value < mod.search_value_threshold:
                return PatternS, t

            mod.symbol_start_time = mod.symbol_end_time
            mod.symbol_end_time = mod.symbol_start_time + p0
            mod.search_sync_time = mod.symbol_end_time
            mod.search_start_time = mod.search_sync_time - p4
            mod.search_end_time = mod.search_sync_time + p4
            mod.search_value_threshold = F(mod.correlated_peak_value * 0.25)
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0

            self.symbol.value = 0 if mod.search_corr_0 > mod.search_corr_1 else 1
            self.symbol.start = mod.symbol_start_time - d
            self.symbol.end = mod.symbol_end_time - d
            self.symbol.length = self.symbol.end - self.symbol.start
            self.symbol.pattern = Pattern1 if self.symbol.value else Pattern0
            return self.symbol.pattern, t

        return Invalid, t

    # ---------------------------------------------------------------- protocol

    def process(self, frame: Frame):
        """NfcV.cpp:1108-1180 — note the MINUS symbolDelayDetect on the
        poll->listen guard/waiting windows (NfcV.cpp:1147-1150)."""
        ctx = self.ctx
        fs = self.frame

        fs.frame_guard_time = self.protocol.frame_guard_time
        if frame.frame_type == int(FrameType.NfcPollFrame):
            fs.frame_waiting_time = self.protocol.frame_waiting_time

        self.process_other(frame)

        frame.set_flags(self.chained_flags)

        if frame.frame_type == int(FrameType.NfcPollFrame):
            if ctx.bitrate is not None:
                fs.guard_end = (
                    fs.frame_end + fs.frame_guard_time - ctx.bitrate.symbol_delay_detect
                )
                fs.waiting_end = (
                    fs.frame_end
                    + fs.frame_waiting_time
                    - ctx.bitrate.symbol_delay_detect
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

    def process_other(self, frame: Frame):
        """NfcV.cpp:1185-1189."""
        frame.frame_phase = int(FramePhase.NfcApplicationPhase)
        if not check_crc_nfcv(frame.data):
            frame.set_flags(FrameFlags.CrcError)
