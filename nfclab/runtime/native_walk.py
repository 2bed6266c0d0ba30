"""Native dirty-span execution: bridges the Python walker to the C++
detect-span stepper (native/src/detect_span.cpp).

Marshals each dirty tech's per-rate ModulationStatus into a flat double
array, runs the span natively, and unmarshals.  On an "interesting" sample
(lock or deferred action) the native side restores the pre-sample snapshot
and the walker re-executes that sample in Python — so the native path can
never diverge from the pure-Python semantics.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..core import nfc

# modulation field order (matches detect_span.cpp M_* enum)
_FIELDS = (
    "search_mode_state",
    "search_start_time",
    "search_end_time",
    "search_sync_time",
    "search_pulse_width",
    "search_value_threshold",
    "search_last_phase",
    "search_last_value",
    "search_sync_value",
    "search_corr_0",
    "symbol_start_time",
    "symbol_end_time",
    "correlated_peak_value",
    "correlated_peak_time",
    "detector_peak_value",
    "detector_peak_time",
    "search_corr_d",
    "search_corr_1",
    "symbol_rise_time",
    "search_phase_threshold",
)
_INT_FIELDS = {
    "symbol_rise_time",
    "search_mode_state",
    "search_start_time",
    "search_end_time",
    "search_sync_time",
    "search_pulse_width",
    "symbol_start_time",
    "symbol_end_time",
    "correlated_peak_time",
    "detector_peak_time",
}
_NF = len(_FIELDS)

_F32P = None
_F64P = None
_I32P = None


def _ptr_f32(a):
    from ..core.streamview import as_f32_ptr

    return as_f32_ptr(a)


def _ptr_f64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ptr_i32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _ptr_i64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _ptr_u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _pack(mods) -> np.ndarray:
    out = np.zeros((len(mods), _NF), np.float64)
    _pack_into(out, mods)
    return out


def _pack_into(out: np.ndarray, mods):
    for i, m in enumerate(mods):
        for j, f in enumerate(_FIELDS):
            out[i, j] = float(getattr(m, f))


def _unpack(arr: np.ndarray, mods):
    for i, m in enumerate(mods):
        for j, f in enumerate(_FIELDS):
            v = arr[i, j]
            if f in _INT_FIELDS:
                setattr(m, f, int(v))
            else:
                setattr(m, f, np.float32(v))


def _params(bitrates, with_pre1: bool = False) -> np.ndarray:
    out = np.zeros((len(bitrates), 7), np.int32)
    for i, br in enumerate(bitrates):
        out[i] = (
            br.symbol_delay_detect,
            br.period0,
            br.period1,
            br.period2,
            br.period4,
            br.period8,
            getattr(br, "preamble1", 0) if with_pre1 else 0,
        )
    return out


# ----------------------------------------------------------- decode marshals
# (symbol/stream layouts match fsm_common.h S_* / ST_* enums)

_SYM_FIELDS = ("pattern", "value", "start", "end", "edge")
_STREAM_FIELDS = (
    "previous",
    "pattern",
    "bits",
    "skip",
    "data",
    "flags",
    "parity",
    "bytes",
)

# frame-level result codes (fsm_common.h R_*)
R_END_OF_SIGNAL = 0
R_FRAME = 1
R_RESET = 2
R_FRAME_SEARCH = 3
R_NO_PATTERN = 4
R_SOF = 5

STREAM_CAP = 4096


def pack_symbol(sym) -> np.ndarray:
    return np.array([float(getattr(sym, f)) for f in _SYM_FIELDS], np.float64)


def unpack_symbol(arr: np.ndarray, sym):
    sym.pattern = int(arr[0])
    sym.value = int(arr[1])
    sym.start = int(arr[2])
    sym.end = int(arr[3])
    sym.edge = int(arr[4])
    sym.length = sym.end - sym.start


def pack_stream(stream):
    st = np.array([int(getattr(stream, f)) for f in _STREAM_FIELDS], np.int64)
    buf = np.zeros(STREAM_CAP, np.uint8)
    if stream.bytes:
        buf[: stream.bytes] = np.frombuffer(
            bytes(stream.buffer[: stream.bytes]), np.uint8
        )
    return st, buf


def unpack_stream(st: np.ndarray, buf: np.ndarray, stream):
    for i, f in enumerate(_STREAM_FIELDS):
        setattr(stream, f, int(st[i]))
    stream.buffer = bytearray(buf[: stream.bytes].tobytes())


def native_decode_lib():
    """The loaded native library if it exports the decode-phase loops."""
    from ..native.binding import _load

    lib = _load()
    if lib is None or not hasattr(lib, "nfclab_v_poll_frame"):
        return None
    return lib


_EMPTY_F32 = np.zeros(1, np.float32)
_EMPTY_F64 = np.zeros(1, np.float64)
_EMPTY_I32 = np.zeros(1, np.int32)
_EMPTY_I64 = np.zeros(1, np.int64)


def _vaddr(x) -> int:
    """Virtual address of an ndarray / StreamView (what the kernel sees)."""
    from ..core.streamview import StreamView

    if isinstance(x, StreamView):
        return x.data.ctypes.data - x.base * x.data.itemsize
    return x.ctypes.data


def _build_detect_args(ctx, carrier, techs):
    """Prepared argument list + per-call mutation hooks for
    nfclab_detect_all.  Everything except (t0, t1, carrier on/off clocks,
    per-tech modulation state) is constant for a given channel binding, so
    the ~40 ctypes conversions and the params-array allocations happen once
    per bind instead of per call (~200 us/call saved on the walk hot path).
    The cache key is the tuple of kernel-visible pointers; any rebind
    (feed growth, window shift, buffer reallocation) changes it."""
    by_name = {type(te).__name__: te for te in techs}
    a = by_name.get("NfcATech")
    b = by_name.get("NfcBTech")
    f = by_name.get("NfcFTech")
    v = by_name.get("NfcVTech")
    cond = ctx.cond

    t0_c = ctypes.c_int64(0)
    t1_c = ctypes.c_int64(0)
    on_c = ctypes.c_int(0)
    off_c = ctypes.c_int(0)

    args = [
        t0_c,
        t1_c,
        _ptr_f32(cond.envelope),
        _ptr_f32(cond.filtered),
        _ptr_f32(cond.mod_depth),
        _ptr_f32(cond.value),
        _ptr_f32(cond.average),
        ctypes.c_float(float(ctx.power_level_threshold)),
        on_c,
        off_c,
        ctypes.c_float(float(ctx.params.signal_low_threshold)),
        ctypes.c_float(float(ctx.params.signal_high_threshold)),
    ]

    packs = []  # (st_array, mods, tech_or_None)

    if a is not None:
        a_par = _params(a.bitrates)
        a_st = _pack(a.mod)
        a_box = a._box
        packs.append((a_st, a.mod, a))
        args += [
            ctypes.c_int(1),
            _ptr_i32(a_par),
            _ptr_f64(a_st),
            _ptr_f32(a_box[0]),
            _ptr_f32(a_box[1]),
            _ptr_f32(a_box[2]),
            ctypes.c_float(float(a.correlation_threshold)),
            ctypes.c_float(float(a.minimum_modulation_deep)),
        ]
        a_keep = (a_par,)
    else:
        args += [
            ctypes.c_int(0), _ptr_i32(_EMPTY_I32), _ptr_f64(_EMPTY_F64),
            _ptr_f32(_EMPTY_F32), _ptr_f32(_EMPTY_F32), _ptr_f32(_EMPTY_F32),
            ctypes.c_float(0.0), ctypes.c_float(0.0),
        ]
        a_keep = ()

    if b is not None:
        b_mods = b.mod[: nfc.R212K + 1]
        b_par = _params(b.bitrates[: nfc.R212K + 1])
        b_st = _pack(b_mods)
        packs.append((b_st, b_mods, None))
        args += [
            ctypes.c_int(1),
            _ptr_i32(b_par),
            _ptr_f64(b_st),
            ctypes.c_int(len(b_mods)),
            ctypes.c_float(float(b.minimum_modulation_deep)),
            ctypes.c_float(float(b.maximum_modulation_deep)),
        ]
        b_keep = (b_par,)
    else:
        args += [
            ctypes.c_int(0), _ptr_i32(_EMPTY_I32), _ptr_f64(_EMPTY_F64),
            ctypes.c_int(0), ctypes.c_float(0.0), ctypes.c_float(0.0),
        ]
        b_keep = ()

    if f is not None:
        f_par = _params(f.bitrates, with_pre1=True)
        f_st = _pack(f.mod)
        f_box = f._box
        packs.append((f_st, f.mod, None))
        args += [
            ctypes.c_int(1),
            _ptr_i32(f_par),
            _ptr_f64(f_st),
            ctypes.c_int(len(f.mod)),
            _ptr_f32(f_box[0]),
            _ptr_f32(f_box[1] if len(f_box) > 1 else _EMPTY_F32),
            ctypes.c_float(float(f.correlation_threshold)),
            ctypes.c_float(float(f.maximum_modulation_deep)),
        ]
        f_keep = (f_par,)
    else:
        args += [
            ctypes.c_int(0), _ptr_i32(_EMPTY_I32), _ptr_f64(_EMPTY_F64),
            ctypes.c_int(0), _ptr_f32(_EMPTY_F32), _ptr_f32(_EMPTY_F32),
            ctypes.c_float(0.0), ctypes.c_float(0.0),
        ]
        f_keep = ()

    if v is not None:
        v_par = _params([v.bitrate])
        v_st = _pack([v.mod])
        packs.append((v_st, [v.mod], None))
        args += [
            ctypes.c_int(1),
            _ptr_i32(v_par),
            _ptr_f64(v_st),
            _ptr_f32(v._box),
            ctypes.c_float(float(v.correlation_threshold)),
            ctypes.c_float(float(v.minimum_modulation_deep)),
        ]
        v_keep = (v_par,)
    else:
        args += [
            ctypes.c_int(0), _ptr_i32(_EMPTY_I32), _ptr_f64(_EMPTY_F64),
            _ptr_f32(_EMPTY_F32), ctypes.c_float(0.0), ctypes.c_float(0.0),
        ]
        v_keep = ()

    # candidate union for the idle fast path: the techs' detect-trigger
    # index channels (conservative engage supersets, the same arrays the
    # Python walk's next_interesting consults) + carrier crossing run
    # starts.  When every FSM is idle, the native loop binary-searches this
    # instead of re-deriving engage conditions per sample.
    cand, cand_srcs = _candidate_union(carrier, techs, ctx)
    if cand is not None and len(cand):
        args += [_ptr_i64(cand), ctypes.c_int64(len(cand))]
    else:
        args += [_ptr_i64(_EMPTY_I64), ctypes.c_int64(0)]

    return {
        "stable": _detect_stable_key(ctx, techs),
        "vol": _detect_volatile_key(carrier, techs),
        "args": args,
        "cand_pos": len(args) - 2,
        "scalars": (t0_c, t1_c, on_c, off_c),
        "packs": packs,
        # param + candidate arrays stay alive with the cache entry.  The
        # union's SOURCE arrays are retained too: the keys identify them
        # by (address, length), which is only collision-free while the
        # originals stay allocated (a freed array's block could be recycled
        # for a same-size replacement with different clocks, silently
        # reusing a stale union)
        "keep": (a_keep, b_keep, f_keep, v_keep, cand, cand_srcs),
    }


def _merge_parts(parts):
    from ..native.binding import merge_sorted_native

    out = merge_sorted_native(parts)  # k-way merge of the sorted sources
    if out is None:
        out = np.sort(np.concatenate(parts))  # duplicates are harmless
    return np.ascontiguousarray(out)


def _candidate_union(carrier, techs, ctx=None):
    """(union, sources): sorted int64 union of every idle-engage candidate
    clock — per-tech detect-trigger indices + carrier hysteresis run starts
    — plus the source arrays (retained by the caller so the address-keyed
    cache stays sound).  (None, ()) when any tech's mask indices are
    unavailable (the C++ IdleScan then re-derives engage conditions per
    sample, the pre-candidate behavior).

    Streaming fast path: index channels only ever APPEND entries beyond the
    previous feed's clocks, so when every source kept its buffer and only
    grew, the new tails merge among themselves and append to the cached
    union — O(new) per feed instead of a full O(total) rebuild (which made
    the union ~2/3 of dense live-decode time).  A monotonicity guard (tail
    head must exceed the cached union's last clock) falls back to the full
    rebuild, so correctness never rests on the append-only invariant."""
    srcs = [carrier._above_idx, carrier._below_idx]
    for te in techs:
        mi = getattr(te, "_mask_idx", None)
        if mi is None:
            return None, ()
        if isinstance(mi, np.ndarray):
            srcs.append(mi)
        else:
            if not mi:
                return None, ()
            srcs.extend(mi)
    parts = [np.ascontiguousarray(a, np.int64) for a in srcs]

    state = getattr(ctx, "_nw_union", None) if ctx is not None else None
    if state is not None and len(state["sig"]) == len(parts):
        tails = []
        ok = True
        for (ptr, n0), p in zip(state["sig"], parts):
            if p.ctypes.data != ptr or len(p) < n0:
                ok = False
                break
            if len(p) > n0:
                tails.append(p[n0:])
        if ok:
            used = state["used"]
            if tails:
                heads = min(int(t[0]) for t in tails)
                if used and heads <= int(state["buf"][used - 1]):
                    ok = False  # invariant violated: full rebuild
                else:
                    add = (
                        tails[0] if len(tails) == 1 else _merge_parts(tails)
                    )
                    buf = state["buf"]
                    if used + len(add) > len(buf):
                        nbuf = np.empty(
                            max(len(buf) * 2, used + len(add)), np.int64
                        )
                        nbuf[:used] = buf[:used]
                        buf = state["buf"] = nbuf
                    buf[used : used + len(add)] = add
                    state["used"] = used + len(add)
            if ok:
                state["sig"] = [(p.ctypes.data, len(p)) for p in parts]
                return state["buf"][: state["used"]], tuple(srcs)

    out = _merge_parts(parts)
    if ctx is not None:
        buf = np.empty(max(len(out) * 2, 1024), np.int64)
        buf[: len(out)] = out
        ctx._nw_union = {
            "sig": [(p.ctypes.data, len(p)) for p in parts],
            "buf": buf,
            "used": len(out),
        }
        return buf[: len(out)], tuple(srcs)
    return out, tuple(srcs)


def _detect_stable_key(ctx, techs):
    """Pointers the prepared ctypes argument list bakes in: cond + box
    channel bases.  Unchanged across streaming appends (growable buffers
    keep their base); any window shift / reallocation changes it and
    forces a full rebuild."""
    cond = ctx.cond
    key = [id(techs)]
    for arr in (cond.envelope, cond.filtered, cond.mod_depth, cond.value,
                cond.average):
        key.append(_vaddr(arr))
    for te in techs:
        name = type(te).__name__
        if name == "NfcATech":
            key += [_vaddr(te._box[0]), _vaddr(te._box[1]),
                    _vaddr(te._box[2])]
        elif name == "NfcFTech":
            key.append(_vaddr(te._box[0]))
            if len(te._box) > 1:
                key.append(_vaddr(te._box[1]))
        elif name == "NfcVTech":
            key.append(_vaddr(te._box))
    return tuple(key)


def _detect_volatile_key(carrier, techs):
    """The candidate-union inputs: trigger-index channels grow every feed,
    so only the union slots of the cached args refresh when this part
    changes (the full ctypes rebuild was ~3 ms/feed of live decode)."""
    key = []
    for te in techs:
        mi = getattr(te, "_mask_idx", None)
        if isinstance(mi, np.ndarray):
            key.append((mi.ctypes.data, len(mi)))
        elif mi:
            key.extend((a.ctypes.data, len(a)) for a in mi)
    if carrier is not None:
        key.append((carrier._above_idx.ctypes.data, len(carrier._above_idx)))
        key.append((carrier._below_idx.ctypes.data, len(carrier._below_idx)))
    return tuple(key)


def run_native_detect_all(ctx, carrier, techs, t0: int, t1: int) -> int:
    """Step carrier + every enabled tech natively over [t0, t1); returns the
    first sample needing Python handling (carrier crossing or tech lock,
    re-executed by the caller) or t1 when the stream is exhausted."""
    from ..native.binding import _load

    lib = _load()
    if lib is None:
        return t0

    cache = getattr(ctx, "_nw_detect", None)
    if cache is None or cache["stable"] != _detect_stable_key(ctx, techs):
        cache = _build_detect_args(ctx, carrier, techs)
        ctx._nw_detect = cache
    else:
        vol = _detect_volatile_key(carrier, techs)
        if cache["vol"] != vol:
            # index channels grew: refresh only the union argument slots
            cand, cand_srcs = _candidate_union(carrier, techs, ctx)
            args = cache["args"]
            pos = cache["cand_pos"]
            if cand is not None and len(cand):
                args[pos] = _ptr_i64(cand)
                args[pos + 1] = ctypes.c_int64(len(cand))
            else:
                args[pos] = _ptr_i64(_EMPTY_I64)
                args[pos + 1] = ctypes.c_int64(0)
            cache["keep"] = cache["keep"][:4] + (cand, cand_srcs)
            cache["vol"] = vol
        for st, mods, _ in cache["packs"]:
            _pack_into(st, mods)

    t0_c, t1_c, on_c, off_c = cache["scalars"]
    t0_c.value = t0
    t1_c.value = t1
    on_c.value = int(carrier.carrier_on_time)
    off_c.value = int(carrier.carrier_off_time)

    res = lib.nfclab_detect_all(*cache["args"])

    for st, mods, a in cache["packs"]:
        _unpack(st, mods)
        if a is not None:
            a._version += 1
            a._ni_cache = None

    return int(res) if res >= 0 else t1


def run_native_span(ctx, dirty, t0: int, t1: int) -> int:
    """Step dirty techs natively over [t0, t1); returns the clock to resume
    Python stepping from (t1 when the span completed cleanly)."""
    from ..native.binding import _load

    lib = _load()
    if lib is None:
        return t0

    by_name = {type(te).__name__: te for te in dirty}
    b = by_name.get("NfcBTech")
    f = by_name.get("NfcFTech")
    v = by_name.get("NfcVTech")

    cond = ctx.cond

    if b is not None:
        b_mods = b.mod[: nfc.R212K + 1]
        b_par = _params(b.bitrates[: nfc.R212K + 1])
        b_st = _pack(b_mods)
    if f is not None:
        f_par = _params(f.bitrates, with_pre1=True)
        f_st = _pack(f.mod)
        f_box = f._box
    if v is not None:
        v_par = _params([v.bitrate])
        v_st = _pack([v.mod])
        v_box = v._box

    res = lib.nfclab_detect_span(
        ctypes.c_int64(t0),
        ctypes.c_int64(t1),
        _ptr_f32(cond.envelope),
        _ptr_f32(cond.filtered),
        _ptr_f32(cond.mod_depth),
        _ptr_f32(cond.value),
        ctypes.c_float(float(ctx.power_level_threshold)),
        ctypes.c_int(1 if b is not None else 0),
        _ptr_i32(b_par if b is not None else _EMPTY_I32),
        _ptr_f64(b_st if b is not None else _EMPTY_F64),
        ctypes.c_int(len(b_mods) if b is not None else 0),
        ctypes.c_float(float(b.minimum_modulation_deep) if b is not None else 0.0),
        ctypes.c_float(float(b.maximum_modulation_deep) if b is not None else 0.0),
        ctypes.c_int(1 if f is not None else 0),
        _ptr_i32(f_par if f is not None else _EMPTY_I32),
        _ptr_f64(f_st if f is not None else _EMPTY_F64),
        ctypes.c_int(len(f.mod) if f is not None else 0),
        _ptr_f32(f_box[0] if f is not None else _EMPTY_F32),
        _ptr_f32(f_box[1] if f is not None and len(f_box) > 1 else _EMPTY_F32),
        ctypes.c_float(float(f.correlation_threshold) if f is not None else 0.0),
        ctypes.c_float(float(f.maximum_modulation_deep) if f is not None else 0.0),
        ctypes.c_int(1 if v is not None else 0),
        _ptr_i32(v_par if v is not None else _EMPTY_I32),
        _ptr_f64(v_st if v is not None else _EMPTY_F64),
        _ptr_f32(v_box if v is not None else _EMPTY_F32),
        ctypes.c_float(float(v.correlation_threshold) if v is not None else 0.0),
        ctypes.c_float(float(v.minimum_modulation_deep) if v is not None else 0.0),
    )

    if b is not None:
        _unpack(b_st, b_mods)
    if f is not None:
        _unpack(f_st, f.mod)
    if v is not None:
        _unpack(v_st, [v.mod])

    return int(res) if res >= 0 else t1
