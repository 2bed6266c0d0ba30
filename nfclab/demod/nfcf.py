"""NFC-F (FeliCa / ISO18092) demodulator.

Event-driven parity with tech/NfcF.cpp: Manchester 212/424 kbps with a 48
symbol-0 preamble.  Detection counts preamble pulses on the half-symbol box
correlator, then locks polarity (observed/reversed) at the preamble-to-sync
transition (NfcF.cpp:206-408).  Poll and listen symbol decoders are the same
correlator walk (NfcF.cpp:641-744, 941-1042); frames carry a 0xB24D sync pair
that is checked and stripped (NfcF.cpp:466-471).  symbolDelayDetect is zero for
both rates (NfcF.cpp:159), so all channels are read at the current clock.
"""

from __future__ import annotations

import numpy as np

from ..core import nfc
from ..core.frame import Frame, FrameFlags, FramePhase, FrameTech, FrameType
from ..core.params import BUFFER_SIZE as RING, BitrateParams
from ..protocol.crc import check_crc_nfcf
from .common import (
    BUFFER_SIZE,
    sd_af,
    FrameStatus,
    ModulationStatus,
    StreamStatus,
    SymbolStatus,
)

F = np.float32

# pattern types (NfcF.cpp:36-44)
Invalid = 0
NoPattern = 1
PatternL = 2
PatternH = 3
PatternS = 4
PatternE = 5

SEARCH_MODE_OBSERVED = 0
SEARCH_MODE_REVERSED = 1


def nfcf_bitrates(sample_rate: int) -> list[BitrateParams]:
    """NfcF.cpp:131-184 — rates 212k/424k with zero delay cascade and the
    48-symbol preamble length."""
    stu = float(sample_rate) / nfc.NFC_FC
    out = []
    for rate in (nfc.R212K, nfc.R424K):
        p1 = int(round(stu * (128 >> rate)))
        b = BitrateParams(
            tech_type=int(FrameTech.NfcFTech),
            rate_type=rate,
            symbols_per_second=int(round(nfc.NFC_FC / float(128 >> rate))),
            period0=int(round(stu * (256 >> rate))),
            period1=p1,
            period2=int(round(stu * (64 >> rate))),
            period4=int(round(stu * (32 >> rate))),
            period8=int(round(stu * (16 >> rate))),
            symbol_delay_detect=0,
            offset_future=RING,
            offset_signal=RING,
        )
        b.preamble1 = int(round(stu * (128 >> rate) * 48))
        out.append(b)
    return out


class NfcFTech:
    tech_type = FrameTech.NfcFTech

    def __init__(self, ctx):
        self.ctx = ctx
        # config (NfcF.cpp:87-94; single source of truth core.thresholds,
        # defaults 0.10 / 0.90 / 0.50)
        th = ctx.thresholds.nfcf
        self.minimum_modulation_deep = F(th.min_modulation_deep)
        self.maximum_modulation_deep = F(th.max_modulation_deep)
        self.correlation_threshold = F(th.correlation)

        self.bitrates = []
        self.mod = []
        self.symbol = SymbolStatus()
        self.stream = StreamStatus()
        self.frame = FrameStatus()
        self.protocol = FrameStatus()
        self.chained_flags = 0
        self.last_frame_end = 0
        self.max_frame_size = 256
        self._box = []
        self._mask_idx = []

    def initialize(self):
        """NfcF.cpp:106-204 + dense channel/mask precomputation."""
        ctx = self.ctx
        stu = ctx.params.sample_time_unit
        self.last_frame_end = 0
        self.chained_flags = 0
        self.symbol.reset()
        self.stream.reset()
        self.frame = FrameStatus()
        self.bitrates = nfcf_bitrates(ctx.sample_rate)
        self.mod = [ModulationStatus() for _ in self.bitrates]

        self.protocol = FrameStatus()
        self.max_frame_size = 256
        self.protocol.start_up_guard_time = int(stu * nfc.NFCF_SFGT_DEF)
        self.protocol.frame_guard_time = int(stu * nfc.NFCF_FGT_DEF)
        self.protocol.frame_waiting_time = int(stu * nfc.NFCF_FWT_DEF)
        self.protocol.request_guard_time = int(stu * nfc.NFCF_RGT_DEF)
        self.frame.start_up_guard_time = self.protocol.start_up_guard_time
        self.frame.frame_waiting_time = self.protocol.frame_waiting_time
        self.frame.frame_guard_time = self.protocol.frame_guard_time
        self.frame.request_guard_time = self.protocol.request_guard_time

        self.bind_channels()

    def bind_channels(self):
        ctx = self.ctx
        ch = ctx.channels
        env = ctx.cond.envelope
        power = None
        self._box = []
        self._mask_idx = []
        for br in self.bitrates:
            box = ch.box_value(br.period2)
            idx = ch.detect_idx(
                0,
                br.period1,
                br.period2,
                self.correlation_threshold,
                ctx.power_level_threshold,
            )
            if idx is None:
                sd = ch.detect_sd(box, 0, br.period1, br.period2)
                if power is None:
                    power = env >= ctx.power_level_threshold
                mask = power & (np.abs(sd) > self.correlation_threshold * env)
                mask[:BUFFER_SIZE] = False
                idx = np.flatnonzero(mask)
            self._box.append(box)
            self._mask_idx.append(idx)

    def debug_sd_channels(self):
        """Dense |SD| inputs per rate for the debug tap (d = 0)."""
        ch = self.ctx.channels
        return [
            ch.detect_sd(ch.box_value(br.period2), 0, br.period1, br.period2)
            for br in self.bitrates
        ]

    # ------------------------------------------------------------------ detect

    def is_dirty(self) -> bool:
        """True while mid-preamble-search (bounded, ~48 symbols)."""
        for mod in self.mod:
            if (
                mod.search_sync_time
                or mod.correlated_peak_time
                or mod.search_end_time
                or mod.search_pulse_width
                or mod.symbol_start_time
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

    def _corr(self, br, box, t):
        """S0, S1 at clock t (d = 0)."""
        s0 = box[t] - box[t - (br.period1 - br.period2)]
        s1 = box[t - (br.period1 - br.period2)] - box[t - 1]
        return s0, s1

    def detect_step(self, t: int) -> bool:
        """NfcF.cpp:206-408."""
        ctx = self.ctx
        if t < BUFFER_SIZE:
            return False
        env = ctx.cond.envelope[t]
        if env < ctx.power_level_threshold:
            return False
        min_corr = F(env * self.correlation_threshold)
        mdepth = ctx.cond.mod_depth

        for r, (br, mod) in enumerate(zip(self.bitrates, self.mod)):
            sd = abs(sd_af(self._box[r], t, 0, br.period1, br.period2))
            signal_deep = mdepth[t]

            # recover on deep overflow or stale peak (NfcF.cpp:260-271)
            if signal_deep > self.maximum_modulation_deep or (
                mod.correlated_peak_time
                and t > mod.correlated_peak_time + br.period1
            ):
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

            if sd > min_corr:
                if sd > mod.correlated_peak_value:
                    mod.correlated_peak_value = sd
                    mod.correlated_peak_time = t
                    if not mod.search_sync_time:
                        box = ctx.channels.box_value(br.period2)
                        s0, _ = self._corr(br, box, t)
                        mod.search_sync_value = sd
                        mod.search_corr_0 = s0
                        mod.search_end_time = t + br.period8

            if t == mod.search_sync_time:
                box = ctx.channels.box_value(br.period2)
                s0, _ = self._corr(br, box, t)
                mod.search_sync_value = sd
                mod.search_last_value = s0

            if t != mod.search_end_time:
                continue

            # preamble pulse validity for the first 94 pulses (NfcF.cpp:307-328)
            pw = mod.search_pulse_width
            mod.search_pulse_width += 1
            if pw < 94:
                if (
                    mod.correlated_peak_time == 0
                    or mod.search_sync_value < mod.search_value_threshold
                ):
                    self._reset_search(mod)
                    continue

            # continue preamble tracking (NfcF.cpp:331-351)
            if mod.search_sync_value > mod.search_value_threshold:
                if not mod.symbol_start_time:
                    mod.symbol_start_time = mod.correlated_peak_time - br.period2
                mod.symbol_end_time = mod.correlated_peak_time
                mod.search_sync_time = mod.symbol_end_time + br.period2
                mod.search_start_time = mod.search_sync_time - br.period8
                mod.search_end_time = mod.search_sync_time + br.period8
                mod.search_value_threshold = F(mod.correlated_peak_value / 2)
                mod.search_last_phase = mod.search_last_value
                mod.correlated_peak_time = 0
                mod.correlated_peak_value = 0.0
                continue

            # polarity compensation (NfcF.cpp:354-355)
            if (mod.search_last_phase < 0 and mod.search_corr_0 < 0) or (
                mod.search_last_phase > 0 and mod.search_corr_0 > 0
            ):
                mod.symbol_start_time -= br.period2

            preamble_len = mod.symbol_end_time - mod.symbol_start_time
            if (
                preamble_len < br.preamble1 - br.period4
                or preamble_len > br.preamble1 + br.period4
            ):
                self._reset_search(mod)
                continue

            # lock (NfcF.cpp:382-404)
            mod.search_mode_state = (
                SEARCH_MODE_OBSERVED
                if mod.search_last_phase > 0
                else SEARCH_MODE_REVERSED
            )
            mod.search_sync_time = mod.search_sync_time + br.period2
            mod.search_start_time = mod.search_sync_time - br.period4
            mod.search_end_time = mod.search_sync_time + br.period4
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0

            self.symbol.start = mod.symbol_start_time
            self.symbol.end = mod.symbol_end_time
            self.symbol.length = self.symbol.end - self.symbol.start
            self.symbol.pattern = PatternS

            self.frame.frame_type = int(FrameType.NfcPollFrame)
            self.frame.symbol_rate = br.symbols_per_second
            self.frame.frame_start = self.symbol.start
            self.frame.frame_end = 0

            ctx.bitrate = br
            ctx.modulation = mod
            ctx.locked_tech = self
            return True

        return False

    @staticmethod
    def _reset_search(mod: ModulationStatus):
        """NfcF.cpp:316-326 — per-rate preamble search reset."""
        mod.symbol_start_time = 0
        mod.symbol_end_time = 0
        mod.search_sync_time = 0
        mod.search_sync_value = 0.0
        mod.search_start_time = 0
        mod.search_end_time = 0
        mod.search_pulse_width = 0
        mod.search_value_threshold = 0.0
        mod.correlated_peak_value = 0.0
        mod.correlated_peak_time = 0

    def reset_modulation(self):
        """NfcF.cpp:1047-1071."""
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
                    self._frame_native(lib, t, listen=False)
                    if lib is not None
                    else self.decode_poll_frame(t)
                )
                if ctx.modulation is None or t + 1 >= ctx.n:
                    break
            if self.frame.frame_type == int(FrameType.NfcListenFrame):
                t = (
                    self._frame_native(lib, t, listen=True)
                    if lib is not None
                    else self.decode_listen_frame(t)
                )
            elif self.frame.frame_type != int(FrameType.NfcPollFrame):
                break
        return t

    def _frame_native(self, lib, t: int, listen: bool) -> int:
        """Native poll/listen frame loop (decode_f.cpp nfclab_f_frame)."""
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
        par = nw._params([br], with_pre1=True)
        box = ctx.channels.box_value(br.period2)

        code = lib.nfclab_f_frame(
            nw._ptr_f32(box),
            nw._ptr_f32(ctx.cond.deviation),
            ctypes.c_int64(ctx.n),
            nw._ptr_i32(par),
            nw._ptr_f64(st_mod),
            nw._ptr_f64(sym),
            ctypes.c_int32(1 if listen else 0),
            ctypes.c_int32(1 if self.frame.frame_start else 0),
            ctypes.c_int64(self.frame.guard_end),
            ctypes.c_int64(self.frame.waiting_end),
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
        if listen and aux[3]:
            self.frame.frame_start = int(aux[2])

        if code == nw.R_FRAME:
            frame_type = int(
                FrameType.NfcListenFrame if listen else FrameType.NfcPollFrame
            )
            frame = self._finish_frame(frame_type, bool(aux[0]))
            if frame is not None:
                self.process(frame)
                ctx.frames.append(frame)
                if listen:
                    self.reset_modulation()
                else:
                    self.stream.reset()
                    m = ctx.modulation
                    if m is not None:
                        m.symbol_start_time = 0
                        m.symbol_end_time = 0
                        m.search_mode_state = 0
                        m.search_sync_time = 0
                        m.search_start_time = 0
                        m.search_end_time = 0
                        m.search_pulse_width = 0
                        m.search_last_value = 0.0
                        m.search_last_phase = 0.0
                        m.search_value_threshold = 0.0
                        m.search_phase_threshold = 0.0
                        m.correlated_peak_value = 0.0
            else:
                self.reset_modulation()
        elif code == nw.R_NO_PATTERN:
            self.reset_modulation()
        return t

    # ---------------------------------------------------------------- framing

    def _finish_frame(self, frame_type: int, truncate_error: bool) -> Frame | None:
        """Common frame build for poll/listen (NfcF.cpp:448-505, 577-612);
        returns None when the stream is too short."""
        ctx = self.ctx
        stream = self.stream
        if stream.bytes <= 2:
            return None
        self.frame.frame_end = self.symbol.end
        frame = Frame(
            tech_type=int(FrameTech.NfcFTech),
            frame_type=frame_type,
            frame_rate=ctx.bitrate.symbols_per_second,
            data=bytes(stream.buffer[2 : stream.bytes]),
            sample_start=self.frame.frame_start,
            sample_end=self.frame.frame_end,
            sample_rate=ctx.sample_rate,
        )
        frame.time_start = self.frame.frame_start / ctx.sample_rate
        frame.time_end = self.frame.frame_end / ctx.sample_rate
        frame.date_time = ctx.stream_time + frame.time_start
        if truncate_error:
            frame.set_flags(FrameFlags.Truncated)
        if stream.buffer[0] != 0xB2 or stream.buffer[1] != 0x4D:
            frame.set_flags(FrameFlags.SyncError)
        return frame

    def decode_poll_frame(self, t: int) -> int:
        """NfcF.cpp:428-529."""
        ctx = self.ctx
        stream = self.stream
        while True:
            pattern, t = self.decode_symbol_ask(t, listen=False)
            if pattern <= NoPattern:
                return t

            frame_end = pattern == PatternE
            truncate_error = (
                not frame_end and stream.bytes == self.max_frame_size
            )

            if frame_end or truncate_error:
                request = self._finish_frame(
                    int(FrameType.NfcPollFrame), truncate_error
                )
                if request is not None:
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

            # MSB-first bit assembly (NfcF.cpp:516-524)
            stream.data = ((stream.data << 1) | self.symbol.value) & 0xFF
            stream.bits += 1
            if stream.bits == 8:
                stream.buffer.append(stream.data)
                stream.bytes += 1
                stream.data = 0
                stream.bits = 0

    def decode_listen_frame(self, t: int) -> int:
        """NfcF.cpp:534-636."""
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
                pattern, t = self.decode_symbol_ask(t, listen=True)
                if pattern <= NoPattern:
                    return t

                frame_end = pattern == PatternE
                truncate_error = (
                    not frame_end and stream.bytes == self.max_frame_size
                )

                if frame_end or truncate_error:
                    response = self._finish_frame(
                        int(FrameType.NfcListenFrame), truncate_error
                    )
                    if response is not None:
                        self.process(response)
                        ctx.frames.append(response)
                    self.reset_modulation()
                    return t

                stream.data = ((stream.data << 1) | self.symbol.value) & 0xFF
                stream.bits += 1
                if stream.bits == 8:
                    stream.buffer.append(stream.data)
                    stream.bytes += 1
                    stream.data = 0
                    stream.bits = 0
        return t

    def decode_symbol_ask(self, t: int, listen: bool) -> tuple[int, int]:
        """NfcF.cpp:641-744 (poll) / 941-1042 (listen) — identical walk."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        p1, p2, p4 = br.period1, br.period2, br.period4
        box = ctx.channels.box_value(p2)
        n = ctx.n
        while t + 1 < n:
            t += 1
            if t < mod.search_start_time:
                t = mod.search_start_time - 1
                continue

            sd = abs(sd_af(box, t, 0, p1, p2))

            if sd > mod.search_value_threshold and sd > mod.correlated_peak_value:
                mod.correlated_peak_value = sd
                mod.correlated_peak_time = t

            if t == mod.search_sync_time:
                s0, s1 = self._corr(br, box, t)
                mod.search_corr_0 = s0
                mod.search_corr_1 = s1

            if t != mod.search_end_time:
                continue

            if not mod.correlated_peak_time:
                return PatternE, t

            mod.symbol_start_time = mod.symbol_end_time
            mod.symbol_end_time = mod.correlated_peak_time
            mod.search_sync_time = mod.symbol_end_time + p1
            mod.search_start_time = mod.search_sync_time - p4
            mod.search_end_time = mod.search_sync_time + p4
            mod.search_value_threshold = F(mod.correlated_peak_value / 2)
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0

            self.symbol.start = mod.symbol_start_time
            self.symbol.end = mod.symbol_end_time
            self.symbol.length = self.symbol.end - self.symbol.start

            if (
                mod.search_mode_state == SEARCH_MODE_OBSERVED
                and mod.search_corr_0 > mod.search_corr_1
            ) or (
                mod.search_mode_state == SEARCH_MODE_REVERSED
                and mod.search_corr_0 < mod.search_corr_1
            ):
                self.symbol.value = 0
                self.symbol.pattern = PatternL
            else:
                self.symbol.value = 1
                self.symbol.pattern = PatternH
            return self.symbol.pattern, t

        return Invalid, t

    def decode_listen_start_ask(self, t: int) -> tuple[int, int]:
        """NfcF.cpp:749-936 — listen preamble search after the guard."""
        ctx = self.ctx
        br = ctx.bitrate
        mod = ctx.modulation
        p2, p4, p8 = br.period2, br.period4, br.period8
        box = ctx.channels.box_value(p2)
        p1 = br.period1
        n = ctx.n
        guard_end = self.frame.guard_end
        waiting_end = self.frame.waiting_end

        while t + 1 < n:
            t += 1
            if t < guard_end:
                t = guard_end - 1
                continue
            if t == guard_end:
                mod.search_value_threshold = F(
                    ctx.cond.deviation[t] * F(10.0)
                )
            if t > waiting_end:
                return NoPattern, t
            if t < mod.search_start_time:
                continue

            sd = abs(sd_af(box, t, 0, p1, p2))

            if sd >= mod.search_value_threshold:
                if sd > mod.correlated_peak_value:
                    mod.correlated_peak_value = sd
                    mod.correlated_peak_time = t
                    if not mod.search_sync_time:
                        s0, _ = self._corr(br, box, t)
                        mod.search_sync_value = sd
                        mod.search_corr_0 = s0
                        mod.search_end_time = t + p8
            elif not mod.search_sync_time and mod.correlated_peak_time == 0:
                # idle: skip to next candidate above threshold or timeout
                limit = min(n, waiting_end + 2)
                nt = self._next_above(
                    box, t + 1, limit, mod.search_value_threshold, p1, p2
                )
                t = (nt if nt is not None else limit) - 1
                continue

            if t == mod.search_sync_time:
                s0, _ = self._corr(br, box, t)
                mod.search_sync_value = sd
                mod.search_last_value = s0

            if t != mod.search_end_time:
                continue

            pw = mod.search_pulse_width
            mod.search_pulse_width += 1
            if pw < 94:
                if (
                    mod.correlated_peak_time == 0
                    or mod.search_sync_value < mod.search_value_threshold
                ):
                    self._reset_search(mod)
                    continue

            if mod.search_sync_value > mod.search_value_threshold:
                if not mod.symbol_start_time:
                    mod.symbol_start_time = mod.correlated_peak_time - p2
                mod.symbol_end_time = mod.correlated_peak_time
                mod.search_sync_time = mod.symbol_end_time + p2
                mod.search_start_time = mod.search_sync_time - p8
                mod.search_end_time = mod.search_sync_time + p8
                mod.search_value_threshold = F(mod.correlated_peak_value / 2)
                mod.search_last_phase = mod.search_last_value
                mod.correlated_peak_time = 0
                mod.correlated_peak_value = 0.0
                continue

            if (mod.search_last_phase < 0 and mod.search_corr_0 < 0) or (
                mod.search_last_phase > 0 and mod.search_corr_0 > 0
            ):
                mod.symbol_start_time -= p2

            preamble_len = mod.symbol_end_time - mod.symbol_start_time
            if (
                preamble_len < br.preamble1 - p4
                or preamble_len > br.preamble1 + p4
            ):
                self._reset_search(mod)
                continue

            mod.search_mode_state = (
                SEARCH_MODE_OBSERVED
                if mod.search_last_phase > 0
                else SEARCH_MODE_REVERSED
            )
            mod.search_sync_time = mod.search_sync_time + p2
            mod.search_start_time = mod.search_sync_time - p4
            mod.search_end_time = mod.search_sync_time + p4
            mod.correlated_peak_time = 0
            mod.correlated_peak_value = 0.0

            self.symbol.start = mod.symbol_start_time
            self.symbol.end = mod.symbol_end_time
            self.symbol.length = self.symbol.end - self.symbol.start
            self.symbol.pattern = PatternS
            return PatternS, t

        return Invalid, t

    @staticmethod
    def _next_above(box, t, limit, thr, p1, p2):
        """First clock with |SD| >= thr; SD computed from the box channel
        chunk-wise with the same f32 op order as the per-sample read."""
        gap = p1 - p2
        fp2 = F(p2)
        t = max(t, p1)
        chunk = 2048
        while t < limit:
            hi = min(t + chunk, limit)
            a0 = box[t:hi]
            a1 = box[t - gap : hi - gap]
            a2 = box[t - 1 : hi - 1]
            seg = np.abs(((a0 - a1) - (a1 - a2)) / fp2) >= thr
            nz = np.argmax(seg)
            if seg[nz]:
                return t + int(nz)
            t = hi
            chunk = min(chunk * 4, 1 << 20)
        return None

    # ---------------------------------------------------------------- protocol

    def process(self, frame: Frame):
        """NfcF.cpp:1076-1147."""
        ctx = self.ctx
        fs = self.frame

        if frame.frame_type == int(FrameType.NfcPollFrame):
            fs.start_up_guard_time = self.protocol.start_up_guard_time
            fs.frame_waiting_time = self.protocol.frame_waiting_time
            fs.frame_guard_time = self.protocol.frame_guard_time
            fs.request_guard_time = self.protocol.request_guard_time
        else:
            fs.frame_guard_time = self.protocol.frame_guard_time

        if not self.process_reqc(frame):
            self.process_other(frame)

        frame.set_flags(self.chained_flags)

        if frame.frame_type == int(FrameType.NfcPollFrame):
            if ctx.bitrate is not None:
                fs.guard_end = fs.frame_end + fs.frame_guard_time
                fs.waiting_end = fs.frame_end + fs.frame_waiting_time
                fs.frame_type = int(FrameType.NfcListenFrame)
        else:
            if ctx.bitrate is not None:
                fs.guard_end = fs.frame_end + fs.frame_guard_time
            fs.frame_type = 0
            fs.last_command = 0

        self.last_frame_end = fs.frame_end
        fs.frame_start = 0
        fs.frame_end = 0

    def process_reqc(self, frame: Frame) -> bool:
        """NfcF.cpp:1152-1201 — REQC/polling (command byte is data[1], after
        the LEN byte)."""
        stu = self.ctx.params.sample_time_unit
        if frame.frame_type == int(FrameType.NfcPollFrame):
            if len(frame.data) > 5 and frame.data[1] == nfc.NFCF_REQC:
                self.frame.last_command = frame.data[1]
                tsn = frame.data[5]
                self.max_frame_size = 256
                self.protocol.start_up_guard_time = int(stu * nfc.NFCF_SFGT_DEF)
                self.protocol.frame_guard_time = int(stu * nfc.NFCF_FGT_DEF)
                self.protocol.frame_waiting_time = int(stu * nfc.NFCF_FWT_DEF)
                self.protocol.request_guard_time = int(stu * nfc.NFCF_RGT_DEF)
                self.frame.frame_guard_time = int(stu * nfc.NFCF_FGT_DEF)
                self.frame.frame_waiting_time = int(
                    stu * (nfc.NFCF_FDT_ATQC + (tsn + 1) * nfc.NFCF_TSU_ATQC)
                )
                self.chained_flags = 0
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                if not check_crc_nfcf(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        if frame.frame_type == int(FrameType.NfcListenFrame):
            if self.frame.last_command == nfc.NFCF_REQC:
                frame.frame_phase = int(FramePhase.NfcSelectionPhase)
                if not check_crc_nfcf(frame.data):
                    frame.set_flags(FrameFlags.CrcError)
                return True
        return False

    def process_other(self, frame: Frame):
        """NfcF.cpp:1206-1210."""
        frame.frame_phase = int(FramePhase.NfcApplicationPhase)
        if not check_crc_nfcf(frame.data):
            frame.set_flags(FrameFlags.CrcError)
