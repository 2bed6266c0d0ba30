"""Correlator channel arrays.

The reference decoders maintain per-sample incremental integrators over ring
buffers (NfcA.cpp:236-255 etc.).  In steady state every one of those
integrators is a *pure function of the signal*: a boxcar sum of some per-sample
integrand, evaluated at a lag.  This module computes those boxcar channels
densely (vectorized; on TPU these are the inner loops of the fused Pallas
pipeline, here exposed with a numpy fallback) so the host symbol-walk FSMs can
read correlation values at arbitrary sample times in O(1).

Channel definitions (sample-time u, decoder-clock t, delay d = symbolDelayDetect):

- ``box_value[r](u)``  = sum value[u-p2+1 .. u]           (NfcA.cpp:246-250)
  The detect/poll ASK integrator: FI(t) = box_value(t - d).
- ``box_sq[r](u)``     = sum (filtered^2 * 10)[u-p2+1..u] (NfcA.cpp:963-970)
  The listen ASK integrator.
- ``box_bpsk[r](u)``   = sum (filtered[v]*filtered[v-p1]*10)[u-p4+1..u]
  The BPSK phase integrator window (NfcA.cpp:1243-1266).

Correlation factors derived from a box channel B at clock t
(ring slot analysis of NfcA.cpp:241-255):

    S0(t) = B(t-d) - B(t-d-(p1-p2))
    S1(t) = B(t-d-(p1-p2)) - B(t-d-1)
    SD(t) = (S0-S1)/p2   (signed, detect)  or |S0-S1|/p2 (poll)

Streaming: every cached channel is *extension-aware*.  After the conditioned
stream grows, ``rebind(cond)`` points the cache at the new arrays and each
getter lazily brings its channel forward over only the new samples — the box
running sums carry their f64 accumulator natively (channels.cpp ``*_ext``
kernels), so the extended arrays are bit-identical to a fresh full-stream
pass.  This is what makes the incremental decoder O(block) per feed.
"""

from __future__ import annotations

import numpy as np

from ..core.streamview import DerivedView

# reference ring size; detect event masks start at this clock
# (NfcA.cpp:220-221 and equivalents; mirrors demod.common.BUFFER_SIZE)
_WARMUP = 1024


def _native():
    try:
        from ..native import binding

        if binding.native_available():
            return binding
    except Exception:
        pass
    return None


def box_sum(x: np.ndarray, width: int) -> np.ndarray:
    """B[u] = sum x[max(0, u-width+1) .. u], float32 output computed with a
    float64 running sum (the reference's f32 running integrator drifts by a
    comparable epsilon; goldens are the accuracy contract).  Native C++
    single pass when available; numpy prefix-sum fallback."""
    nb = _native()
    if nb is not None:
        return nb.box_sum_native(x, width)
    c = np.cumsum(x.astype(np.float64))
    out = c.copy()
    out[width:] = c[width:] - c[:-width]
    return out.astype(np.float32)


class LazyChannels:
    """Per-tech, per-rate channel cache over a conditioned signal.

    Each cached entry is a growable buffer plus a fill mark; accessing a
    channel after ``rebind()`` to a longer stream extends it in place over
    the new tail only.  Entries:

    ``{"arr": capacity buffer (physical window), "n": ABSOLUTE filled clock,
       "acc": f64 carry, "idx": absolute index array, "scanned": absolute
       clocks scanned for idx, "extend": re-entrant extender}``

    Windowed mode (``base > 0``): physical buffers hold only clocks
    ``[base, n)``; getters return :class:`StreamView` so FSMs keep absolute
    indexing, and native kernels receive virtual pointers.  ``rebind`` with
    an advanced base first extends every entry to the current stream end
    (running-sum carries stay continuous), then shifts the windows.
    """

    def __init__(self, cond):
        self.cond = cond
        self.base = 0
        # windowed steady-state capacity (set by StreamingNfcDecoder):
        # allocating channel buffers at their final size up front avoids the
        # doubling-growth copies while the window fills (~2x the window
        # footprint of extra memory traffic per channel otherwise; pages
        # fault in lazily so virtual size is free)
        self.capacity_hint = 0
        self._cache: dict = {}
        # fused per-feed extension plan (extend_all); invalidated whenever
        # the entry set, a buffer address, or the window base changes
        self._plan = None

    @property
    def n(self) -> int:
        return len(self.cond.value)

    def rebind(self, cond, base: int | None = None):
        """Point at the grown conditioned stream (values for already-filled
        clocks must be unchanged); cached channels extend lazily.  When the
        stream window advanced (`base`), entries are brought current and
        their physical windows shifted."""
        self.cond = cond
        if base is None or base == self.base:
            return
        assert base > self.base
        # bring running-sum (box) entries current under the old base — their
        # f64 accumulators must extend continuously.  Derived channels are
        # position-pure and idx sets prune below base, so both extend lazily
        # on next access (restarting from the new base if they went stale).
        # NOTE: the streaming decoder must also call extend_boxes() BEFORE
        # compacting its buffers — a box entry that lagged a full window
        # would otherwise have to read inputs below the new base.
        self.extend_boxes()
        delta = base - self.base
        for ent in self._cache.values():
            if not isinstance(ent, dict):
                continue
            arr = ent.get("arr")
            if arr is not None and ent["n"] > self.base:
                keep = ent["n"] - base
                if keep > 0:
                    arr[:keep] = arr[delta : delta + keep]
            idx = ent.get("idx")
            k = ent.get("idx_n", 0)
            if idx is not None and k:
                cut = int(np.searchsorted(idx[:k], base))
                if cut:
                    idx[: k - cut] = idx[cut:k]
                    ent["idx_n"] = k - cut
        self.base = base
        self._plan = None  # virtual pointers shifted

    def warm_boxes(self, specs):
        """Register several box channels and build them in ONE fused native
        pass (channels.cpp nfclab_box_multi_ext).  Each box is a serial f64
        running-sum chain, latency-bound alone (~350 MS/s); K interleaved
        chains share the source reads and fill the FP pipelines, so the
        whole-capture initial build costs barely more than one chain.
        specs: ("bv", p2) | ("bq", p2) | ("bp", p1, p4).  Entries that
        already exist (device-preloaded channels) are left untouched."""
        for spec in specs:
            tag = spec[0]
            if tag == "bv":
                key, kind, width, lag = ("bv", spec[1]), "sum", spec[1], 0
            elif tag == "bq":
                key, kind, width, lag = ("bq", spec[1]), "sq", spec[1], 0
            else:
                key = ("bp", spec[1], spec[2])
                kind, width, lag = "bpsk", spec[2], spec[1]
            if key in self._cache:
                # existing entry — possibly a device-preloaded channel with
                # extend=None by design; attaching an extend closure to it
                # would arm a zero-f64-carry extension over kernel-f32 data
                continue
            ent = self._entry(key)
            if ent["extend"] is None:
                ent["kind"] = "box"
                ent["meta"] = ({"sum": 0, "sq": 1, "bpsk": 2}[kind],
                               width, lag)
                ent["extend"] = (
                    lambda k=key, kd=kind, w=width, l=lag:
                    self._box_chan(k, kd, w, l)
                )
        self.extend_boxes()

    def extend_boxes(self):
        """Extend every running-sum (box) entry to the current stream end.
        Must run while all of its inputs are still inside the window — the
        streaming decoder calls this before compacting its buffers (and once
        per feed, so the walk finds every box channel current).

        All pending extensions are fused into ONE native pass over the
        conditioned stream (nfclab_box_multi_ext): the per-channel kernels
        would re-read value/filtered once per channel, and with ~14 live
        channels those source re-reads dominate the per-feed cost."""
        n = self.n
        pending = [
            (key, ent)
            for key, ent in list(self._cache.items())
            if isinstance(ent, dict)
            and ent.get("kind") == "box"
            and ent.get("extend") is not None
            and ent["n"] < n
        ]
        nb = _native()
        if nb is None or len(pending) > 64:
            for _, ent in pending:
                ent["extend"]()
            return
        jobs, ents = [], []
        for key, ent in pending:
            ent = self._entry(key)  # ensure output capacity first
            kind, width, lag = ent["meta"]
            jobs.append((kind, width, lag, ent["n"], ent["acc"], ent["arr"]))
            ents.append(ent)
        if jobs:
            nb.box_multi_ext_native(
                self.cond.value, self.cond.filtered, n, self.base, jobs
            )
            for ent in ents:
                ent["n"] = n

    # ------------------------------------------------- fused per-feed extend

    def extend_all(self):
        """Extend EVERY cached channel entry to the current stream end in ONE
        native call (the streaming decoder calls this once per feed, right
        after rebind).  Replaces ~20 per-feed ctypes calls with one and keeps
        the feed tail cache-hot across the box → derived → index chain.
        Results are bit-identical to the lazy per-entry path — the native
        kernel reuses the same per-channel bodies (channels.cpp
        nfclab_feed_ext).  Falls back to the lazy extenders without g++."""
        n = self.n
        nb = _native()
        if nb is None:
            for ent in list(self._cache.values()):
                if isinstance(ent, dict) and ent.get("extend") is not None:
                    ent["extend"]()
            return
        plan = self._plan
        if plan is None or plan["cond_addr"] != nb.vaddr(self.cond.value):
            plan = self._build_plan(nb)
        jobs, metas, caps = plan["jobs"], plan["metas"], plan["caps"]
        base = self.base
        any_work = False
        for i, (cls, ent) in enumerate(metas):
            if cls == "idx":
                s = ent["scanned"]
                if base and s < base + 4096:
                    # events in the dropped past are unreachable (same
                    # restart rule as _idx_chan)
                    s = max(s, min(base + 4096, n))
                    ent["scanned"] = s
                if n - s > caps[i]:
                    # arena slot too small (catch-up span): rebuild sized up
                    self._plan = None
                    return self.extend_all()
            else:
                if len(ent["arr"]) < n - base:
                    # output buffer too small for the grown window: rebuild
                    # the plan (its capacity pass reallocates)
                    self._plan = None
                    return self.extend_all()
                s = ent["n"]
            jobs[i].start = s
            jobs[i].count = 0
            if s < n:
                any_work = True
        if any_work:
            nb.feed_ext_native(self.cond, n, len(metas), jobs)
            arena = plan["arena"]
            offs = plan["offs"]
            for i, (cls, ent) in enumerate(metas):
                if cls == "idx":
                    c = int(jobs[i].count)
                    o = offs[i]
                    self._append_idx(ent, arena[o : o + c], n)
                else:
                    ent["n"] = n
        for ent in plan["py"]:
            ent["extend"]()

    def _build_plan(self, nb):
        """Compile the cached entry set into an NfcFeedJob array (pointers
        resolved once; per-feed execution only updates `start`)."""
        import ctypes

        from ..native.binding import NfcFeedJob, alloc_array

        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        i64p = ctypes.POINTER(ctypes.c_int64)
        base = self.base
        n = self.n

        boxes, idxs, py = [], [], []
        for key, ent in list(self._cache.items()):
            if not isinstance(ent, dict) or ent.get("extend") is None:
                continue
            kind = ent.get("kind")
            if kind == "box":
                boxes.append(key)
            elif kind == "idx" and ent.get("fx") is not None:
                fx = ent["fx"]
                if fx[0] == "sd" and self._cache.get(fx[1]) is None:
                    py.append(ent)
                else:
                    idxs.append(key)
            else:
                py.append(ent)

        # ensure output capacities BEFORE capturing any pointer (growth
        # reallocates)
        for key in boxes:
            self._entry(key)

        k = len(boxes) + len(idxs)
        jobs = (NfcFeedJob * k)()
        metas, caps, offs = [], [], []

        def vp_f32(arr):
            # channel buffers hold clocks [base, ...): virtual pointer
            addr = arr.ctypes.data - base * arr.itemsize
            return ctypes.cast(ctypes.c_void_p(addr), f32p)

        i = 0
        for key in boxes:
            ent = self._cache[key]
            kc, width, lag = ent["meta"]
            j = jobs[i]
            j.kind = kc  # meta kind codes == FX_BOX_* (0 sum, 1 sq, 2 bpsk)
            j.width = width
            j.lag = lag
            j.out = vp_f32(ent["arr"])
            j.acc = ent["acc"].ctypes.data_as(f64p)
            metas.append(("box", ent))
            caps.append(0)
            offs.append(0)
            i += 1
        # index jobs write into fixed arena slots (cap covers a catch-up
        # span; exceeded -> plan rebuilds with a larger slot)
        idx_meta = []
        total = 0
        for key in idxs:
            ent = self._cache[key]
            s = ent["scanned"]
            cap = max(1 << 17, n - s)
            idx_meta.append((key, ent, total, cap))
            total += cap
        # reuse the arena across plan rebuilds (a fresh allocation per
        # compaction would page-fault its whole footprint back in)
        arena = getattr(self, "_arena", None)
        if arena is None or len(arena) < total:
            arena = alloc_array(max(total, 1), np.int64)
            self._arena = arena
        for key, ent, off, cap in idx_meta:
            fx = ent["fx"]
            j = jobs[i]
            if fx[0] == "sd":
                _, src_key, d, p1, p2, corr, power, signed_v = fx
                j.kind = nb.FX_IDX_SD_V if signed_v else nb.FX_IDX_SD_AF
                j.oa = d
                j.p1 = p1
                j.ob = p2
                j.f0 = float(corr)
                j.f1 = float(power)
                j.in_ = vp_f32(self._cache[src_key]["arr"])
            elif fx[0] == "edgeb":
                _, d, min_deep, power_thr = fx
                j.kind = nb.FX_IDX_EDGE_B
                j.oa = d
                j.f0 = float(min_deep)
                j.f1 = float(power_thr)
            else:
                _, src, thr, cmp_op = fx
                table = (
                    {">": nb.FX_IDX_GT, ">=": nb.FX_IDX_GE, "<": nb.FX_IDX_LT}
                    if fx[0] == "cmp"
                    else {">": nb.FX_X_GT, ">=": nb.FX_X_GE, "<": nb.FX_X_LT}
                )
                j.kind = table[cmp_op]
                j.src = nb.FX_SRC[src]
                j.f0 = float(thr)
            j.idx_out = ctypes.cast(
                ctypes.c_void_p(arena.ctypes.data + off * 8), i64p
            )
            metas.append(("idx", ent))
            caps.append(cap)
            offs.append(off)
            i += 1

        plan = {
            "jobs": jobs,
            "metas": metas,
            "caps": caps,
            "offs": offs,
            "arena": arena,
            "py": py,
            "cond_addr": nb.vaddr(self.cond.value),
        }
        self._plan = plan
        return plan

    # ------------------------------------------------------- entry management

    def _entry(self, key, dtype=np.float32):
        from ..native.binding import alloc_array

        window = self.n - self.base
        ent = self._cache.get(key)
        if ent is None:
            if self.base > 0:
                raise RuntimeError(
                    f"channel {key} first created after the stream window "
                    "advanced; warm decode channels at stream start "
                    "(StreamingNfcDecoder does this when windowing is on)"
                )
            ent = {
                "arr": alloc_array(
                    max(window, 4096, self.capacity_hint), dtype
                ),
                "n": self.base,
                "acc": np.zeros(1, np.float64),
                "idx": None,
                "scanned": self.base,
                "extend": None,
            }
            self._cache[key] = ent
            self._plan = None
        if len(ent["arr"]) < window:
            new = alloc_array(
                max(window, len(ent["arr"]) * 2, self.capacity_hint), dtype
            )
            filled = max(0, ent["n"] - self.base)
            new[:filled] = ent["arr"][:filled]
            ent["arr"] = new
            self._plan = None
        return ent

    def _ret(self, ent):
        """Channel view for FSM consumption (absolute clock addressing)."""
        from ..core.streamview import StreamView

        if self.base == 0:
            return ent["arr"][: self.n]
        return StreamView(ent["arr"][: self.n - self.base], self.base)

    @staticmethod
    def _append_idx(ent, new_idx: np.ndarray, scanned: int):
        """Append indices into a growable capacity buffer (amortized
        O(new); a per-feed concatenate would make streaming O(n^2))."""
        from ..native.binding import alloc_array

        k = ent.get("idx_n", 0)
        buf = ent["idx"]
        need = k + len(new_idx)
        if buf is None or len(buf) < need:
            cap = max(need, 1024, 0 if buf is None else len(buf) * 2)
            new = alloc_array(cap, np.int64)
            if k:
                new[:k] = buf[:k]
            ent["idx"] = buf = new
        if len(new_idx):
            buf[k:need] = new_idx
        ent["idx_n"] = need
        ent["scanned"] = scanned

    # ----------------------------------------------------------- box channels

    def _box_chan(self, key, kind: str, width: int, lag: int = 0):
        ent = self._entry(key)
        if ent["extend"] is None:
            ent["kind"] = "box"
            # (kind_code, width, lag) for the fused multi-channel extender
            ent["meta"] = ({"sum": 0, "sq": 1, "bpsk": 2}[kind], width, lag)
            ent["extend"] = lambda: self._box_chan(key, kind, width, lag)
        n = self.n
        if ent["n"] < n:
            src = self.cond.value if kind == "sum" else self.cond.filtered
            nb = _native()
            if nb is not None:
                nb.box_ext_native(kind, src, ent["n"], n, width, lag,
                                  ent["acc"], ent["arr"], self.base)
            else:
                # numpy full recompute (no carry; only used without g++,
                # where windowing never activates)
                if kind == "sum":
                    full = box_sum(src, width)
                elif kind == "sq":
                    q = src.astype(np.float32)
                    q = q * q * np.float32(10.0)
                    full = box_sum(q, width)
                else:  # bpsk
                    fl = src.astype(np.float32)
                    prod = np.zeros_like(fl)
                    prod[lag:] = fl[lag:] * fl[:-lag] * np.float32(10.0)
                    full = box_sum(prod, width)
                ent["arr"][:n] = full
            ent["n"] = n
        return self._ret(ent)

    def box_value(self, p2: int) -> np.ndarray:
        return self._box_chan(("bv", p2), "sum", p2)

    def box_sq(self, p2: int) -> np.ndarray:
        return self._box_chan(("bq", p2), "sq", p2)

    def box_bpsk(self, p1: int, p4: int) -> np.ndarray:
        return self._box_chan(("bp", p1, p4), "bpsk", p4, lag=p1)

    # ------------------------------------------------------- derived channels
    #
    # The listen channels (s0q/pb4/vq) are pure per-clock expressions over a
    # box channel; they used to be materialized as dense per-feed arrays
    # (~32 B/sample of extra write traffic and page-fault footprint).  They
    # are now DerivedViews computing the same single f32 op on read — the
    # native FSMs receive the raw box pointer plus (oa, ob, lo) and inline
    # the identical expression (fsm_common.h fsm_derived_*).

    def corr_s0_dense(self, br):
        """Listen-ASK S0(t) by decoder clock: S0 = Bq(t-d) - Bq(t-d-(p1-p2))
        with Bq the squared-filtered box channel (NfcA.cpp:963-973); zero
        below the first clock with a full window history.  Returned as an
        on-the-fly DerivedView over the box channel (one f32 subtract per
        read — same op, same operands as the former dense array)."""
        d, p1, p2 = br.symbol_delay_detect, br.period1, br.period2
        gap = p1 - p2
        return DerivedView(self.box_sq(p2), d, d + gap, d + p1)

    def bpsk_dense(self, br):
        """BPSK phase window PB4 by decoder clock: PB4(t) indexed so that
        phaseIntegrate(t) = PB4[t] - PB4[guardEnd-1] (NfcA.cpp:1243-1266) —
        a delayed view of the product box channel."""
        d = br.symbol_delay_detect
        return DerivedView(self.box_bpsk(br.period1, br.period4), d, None, d)

    def nfcv_listen_dense(self, br):
        """NFC-V listen channel by decoder clock (NfcV.cpp:825-835): the
        squared-filtered signal box-summed over a FULL symbol (p1) in a
        p0-cycle ring, so S0(t) = B1q(t-d-(p0-p1)) - B1q(t-d)."""
        d, p0, p1 = br.symbol_delay_detect, br.period0, br.period1
        gap = p0 - p1
        return DerivedView(self.box_sq(p1), d + gap, d, d + p0)

    # --------------------------------------------- fused detect SD + indices

    def detect_idx(self, d, p1, p2, corr_thr, power_thr, signed_v=False):
        """Fused detect threshold-crossing clock indices over the box_value(p2)
        channel (channels.cpp one-pass kernels); None when native is
        unavailable (callers keep their numpy fallback).  The FSMs read the
        SD values themselves on the fly (demod.common.sd_af / sd_v), so no
        dense SD array is materialized.  signed_v selects the NFC-V
        formulation (reversed difference, signed threshold)."""
        nb = _native()
        if nb is None:
            return None
        key = (
            "sdidx",
            d,
            p1,
            p2,
            float(corr_thr),
            float(power_thr),
            bool(signed_v),
        )

        def tail(start, n):
            return nb.detect_sd_idx_ext_native(
                self.box_value(p2),
                self.cond.envelope,
                start,
                n,
                d,
                p1,
                p2,
                corr_thr,
                power_thr,
                signed_v,
            )

        if key not in self._cache:
            self.box_value(p2)
        return self._idx_chan(
            key, tail,
            fx=("sd", ("bv", p2), d, p1, p2, corr_thr, power_thr, signed_v),
        )

    # --------------------------------------------------------- index channels

    def _idx_chan(self, key, scan_tail, fx=None) -> np.ndarray:
        """Pure index set (absolute clocks); scan_tail(start, n) returns new
        indices in [start, n).  fx declaratively describes the scan for the
        fused per-feed extender (extend_all)."""
        ent = self._cache.get(key)
        if ent is None:
            ent = {
                "arr": None,
                "n": self.base,
                "acc": None,
                "idx": None,
                "scanned": self.base,
                "extend": None,
            }
            self._cache[key] = ent
            self._plan = None
        if ent["extend"] is None:
            ent["kind"] = "idx"
            ent["fx"] = fx
            ent["extend"] = lambda: self._idx_chan(key, scan_tail, fx)
        n = self.n
        if self.base and ent["scanned"] < self.base + 4096:
            # events in the dropped past are unreachable; rescan from inside
            # the window (scan kernels look back up to d+gap < 4096 samples,
            # which must stay above the window base)
            ent["scanned"] = max(ent["scanned"], min(self.base + 4096, n))
        if ent["scanned"] < n:
            self._append_idx(ent, scan_tail(ent["scanned"], n), n)
        idx = ent["idx"]
        if idx is None:
            return np.empty(0, np.int64)
        return idx[: ent["idx_n"]]

    def threshold_idx(self, src: str, thr, op: str) -> np.ndarray:
        """Clocks where cond.<src> OP thr (op in '>', '>=', '<'), full range."""
        key = ("thr", src, float(thr), op)

        def tail(start, n):
            x = getattr(self.cond, src)
            nb = _native()
            if nb is not None:
                return nb.collect_cmp_ext_native(x, start, n, thr, op)
            seg = x[start:n]
            if op == ">":
                m = seg > thr
            elif op == ">=":
                m = seg >= thr
            else:
                m = seg < thr
            return (np.flatnonzero(m) + start).astype(np.int64)

        return self._idx_chan(key, tail, fx=("cmp", src, float(thr), op))

    def crossing_idx(self, src: str, thr, op: str) -> np.ndarray:
        """Clocks where (cond.<src> OP thr) BECOMES true (run starts).
        Consumers pair this with an O(1) direct test at the query clock:
        next-true >= t is t itself when the condition already holds at t,
        else the next crossing.  Keeps the carrier/power event channels
        O(events) instead of O(samples) for densely-true conditions."""
        key = ("xing", src, float(thr), op)

        def tail(start, n):
            x = getattr(self.cond, src)
            nb = _native()
            if nb is not None:
                return nb.collect_cross_ext_native(x, start, n, thr, op)
            seg = x[start:n]
            if op == ">":
                m = seg > thr
            elif op == ">=":
                m = seg >= thr
            else:
                m = seg < thr
            if start > 0:
                p = x[start - 1]
                prev = p > thr if op == ">" else p >= thr if op == ">=" else p < thr
            else:
                prev = False
            rising = m.copy()
            rising[1:] &= ~m[:-1]
            rising[0] &= not prev
            return (np.flatnonzero(rising) + start).astype(np.int64)

        return self._idx_chan(key, tail, fx=("cross", src, float(thr), op))

    def gt_idx(self, x: np.ndarray, thr) -> np.ndarray:
        """Indices where x > thr.  `x` must be a conditioned-stream array;
        prefer threshold_idx(src_name, ...) which is extension-keyed."""
        if x is self.cond.mod_depth:
            return self.threshold_idx("mod_depth", thr, ">")
        nb = _native()
        if nb is not None:
            return nb.collect_gt_native(x, thr)
        return np.flatnonzero(x > thr)

    def edge_idx_b(self, d: int, min_deep, power_thr) -> np.ndarray:
        """NFC-B falling-edge trigger indices (NfcB.cpp:283 condition over
        the d-shifted filtered signal), from clock 1024 on."""
        key = ("eidxb", d, float(min_deep), float(power_thr))

        def tail(start, n):
            filt = self.cond.filtered
            env = self.cond.envelope
            nb = _native()
            if nb is not None:
                return nb.edge_mask_b_ext_native(
                    filt, env, start, n, d, min_deep, power_thr
                )
            s = max(start, _WARMUP)
            if s >= n:
                return np.empty(0, np.int64)
            if d:
                shifted = np.zeros(n - s, np.float32)
                lo = max(s, d)
                shifted[lo - s :] = filt[lo - d : n - d]
            else:
                shifted = filt[s:n]
            mask = (env[s:n] >= power_thr) & (shifted < -(min_deep * env[s:n]))
            return (np.flatnonzero(mask) + s).astype(np.int64)

        return self._idx_chan(
            key, tail, fx=("edgeb", d, float(min_deep), float(power_thr))
        )

    # ------------------------------------------------------------ legacy API

    def corr_s0_s1(self, box: np.ndarray, t, d: int, p1: int, p2: int):
        """S0, S1 at decoder clock(s) t (scalar or array)."""
        u = np.asarray(t) - d
        s0 = box[u] - box[u - (p1 - p2)]
        s1 = box[u - (p1 - p2)] - box[u - 1]
        return s0, s1

    def detect_sd(self, box: np.ndarray, d: int, p1: int, p2: int) -> np.ndarray:
        """Dense signed SD(t) for all clocks t (numpy fallback path when the
        native fused kernel is unavailable; invalid below t < d+p1)."""
        key = ("sd", d, p1, p2, len(box))

        def f():
            n = len(box)
            sd = np.zeros(n, np.float32)
            lo = d + p1  # first clock with a fully valid window history
            gap = p1 - p2
            a0 = box[lo - d : n - d]
            a1 = box[lo - d - gap : n - d - gap]
            a2 = box[lo - d - 1 : n - d - 1]
            s0 = a0 - a1
            s1 = a1 - a2
            sd[lo:] = (s0 - s1) / np.float32(p2)
            return sd

        if key not in self._cache:
            self._cache[key] = f()
        return self._cache[key]
