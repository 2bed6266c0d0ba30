"""ctypes bindings for the native kernel library."""

from __future__ import annotations

import ctypes
import ctypes.util
import mmap
from dataclasses import dataclass

import numpy as np

from . import build as _build

_MADV_HUGEPAGE = 14
_MADV_POPULATE_WRITE = 23  # Linux 5.14+; harmless EINVAL on older kernels
_libc = None


def _get_libc():
    global _libc
    if _libc is None:
        try:
            _libc = ctypes.CDLL(ctypes.util.find_library("c"), use_errno=True)
        except Exception:
            _libc = False
    return _libc


def alloc_array(n: int, dtype=np.float32) -> np.ndarray:
    """Allocate a numpy array; large ones come from anonymous mmap with
    MADV_HUGEPAGE + MADV_POPULATE_WRITE.  On this VM first-touch page
    faults are the dominant cost of growing streams (each fault exits to
    the hypervisor): 2 MB huge pages would cut the fault count ~512x (not
    granted here), and populating in ONE madvise syscall at alloc time is
    ~2x cheaper than trapping per page AND moves the cost out of the
    decode loop — live sessions then run fault-free from the first block.
    The mmap keeps the memory alive via the returned array's base
    reference."""
    nbytes = int(n) * np.dtype(dtype).itemsize
    if nbytes < (1 << 22):
        return np.empty(n, dtype)
    from ..core.malloc_tune import tuned

    if tuned():
        # malloc_tune'd (bench / short-lived) processes: heap allocations
        # recycle freed blocks WITHOUT refaulting, while a fresh mmap must
        # fault every page again — on this VM's slow fault path that
        # difference is ~10x wall.  Long-running live capture keeps the
        # populate-at-alloc mmap below (bounded high-water mark).
        return np.empty(n, dtype)
    try:
        # MAP_PRIVATE, never the (default) MAP_SHARED: anonymous SHARED
        # mappings survive fork as the SAME physical pages, so a forked
        # worker pool whose parent holds live buffers would let children
        # alias each other's decode state (observed as nondeterministic
        # frame corruption with the persistent fork pool)
        mm = mmap.mmap(
            -1, nbytes, flags=mmap.MAP_PRIVATE | mmap.MAP_ANONYMOUS
        )
        libc = _get_libc()
        if libc:
            addr = ctypes.addressof(ctypes.c_char.from_buffer(mm))
            libc.madvise(
                ctypes.c_void_p(addr),
                ctypes.c_size_t(nbytes),
                ctypes.c_int(_MADV_HUGEPAGE),
            )
            libc.madvise(
                ctypes.c_void_p(addr),
                ctypes.c_size_t(nbytes),
                ctypes.c_int(_MADV_POPULATE_WRITE),
            )
        return np.frombuffer(mm, dtype=dtype)
    except Exception:
        return np.empty(n, dtype)

class NfcFeedJob(ctypes.Structure):
    """Mirror of channels.cpp NfcFeedJob (fused per-feed channel extension).
    Field order/types must match the C struct exactly."""

    _fields_ = [
        ("kind", ctypes.c_int32),
        ("width", ctypes.c_int32),
        ("lag", ctypes.c_int32),
        ("oa", ctypes.c_int32),
        ("p1", ctypes.c_int32),
        ("ob", ctypes.c_int32),
        ("src", ctypes.c_int32),
        ("pad", ctypes.c_int32),
        ("start", ctypes.c_int64),
        ("lo", ctypes.c_int64),
        ("f0", ctypes.c_float),
        ("f1", ctypes.c_float),
        ("in_", ctypes.POINTER(ctypes.c_float)),
        ("out", ctypes.POINTER(ctypes.c_float)),
        ("acc", ctypes.POINTER(ctypes.c_double)),
        ("idx_out", ctypes.POINTER(ctypes.c_int64)),
        ("count", ctypes.c_int64),
    ]


# job kind codes (channels.cpp FX_* enum)
FX_BOX_SUM, FX_BOX_SQ, FX_BOX_BPSK = 0, 1, 2
FX_IDX_SD_AF, FX_IDX_SD_V, FX_IDX_EDGE_B = 3, 4, 5
FX_IDX_GT, FX_IDX_GE, FX_IDX_LT = 6, 7, 8
FX_X_GT, FX_X_GE, FX_X_LT = 9, 10, 11

# cond-source selector order (channels.cpp nfclab_feed_ext srcs[])
FX_SRC = {"value": 0, "envelope": 1, "filtered": 2, "mod_depth": 3,
          "average": 4}


def vaddr(x) -> int:
    """Virtual base address of an ndarray or StreamView (absolute-clock
    addressing for native kernels)."""
    from ..core.streamview import StreamView

    if isinstance(x, StreamView):
        return x.data.ctypes.data - x.base * x.data.itemsize
    return x.ctypes.data


def feed_ext_native(cond, n: int, k: int, jobs) -> None:
    """Run the fused per-feed extension over `jobs` (NfcFeedJob array)."""
    lib = _load()
    f32p = ctypes.POINTER(ctypes.c_float)

    def vp(x):
        return ctypes.cast(ctypes.c_void_p(vaddr(x)), f32p)

    lib.nfclab_feed_ext(
        vp(cond.value),
        vp(cond.filtered),
        vp(cond.envelope),
        vp(cond.mod_depth),
        vp(cond.average),
        ctypes.c_int64(n),
        ctypes.c_int32(k),
        jobs,
    )


_lib = None
_load_error: Exception | None = None


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        # NFCLAB_NATIVE_LIB points at an alternative build of the native
        # library (sanitizer builds: compile src/*.cpp with -fsanitize=...
        # and run under LD_PRELOAD of the sanitizer runtime)
        import os

        path = os.environ.get("NFCLAB_NATIVE_LIB") or _build.build()
        lib = ctypes.CDLL(str(path))
        f32p = ctypes.POINTER(ctypes.c_float)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.nfclab_condition.argtypes = [
            f32p,
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.c_float,
            f32p,
            f32p,
            f32p,
            f32p,
            f32p,
            f32p,
            u32p,
        ]
        lib.nfclab_condition.restype = None
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.nfclab_condition_stream.argtypes = [
            f32p,
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.c_float,
            f64p,
            f32p,
            f32p,
            f32p,
            f32p,
            f32p,
            f32p,
            u32p,
        ]
        lib.nfclab_condition_stream.restype = None
        lib.nfclab_edge_track_ext.argtypes = [
            f32p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.c_float,
            f64p,
            f32p,
            u32p,
        ]
        lib.nfclab_edge_track_ext.restype = None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.nfclab_detect_span.argtypes = [
            ctypes.c_int64,
            ctypes.c_int64,
            f32p,  # env
            f32p,  # filt
            f32p,  # mdepth
            f32p,  # value
            ctypes.c_float,  # power_thr
            ctypes.c_int,  # b_on
            i32p,
            f64p,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_int,  # f_on
            i32p,
            f64p,
            ctypes.c_int,
            f32p,
            f32p,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_int,  # v_on
            i32p,
            f64p,
            f32p,
            ctypes.c_float,
            ctypes.c_float,
        ]
        lib.nfclab_detect_span.restype = ctypes.c_int64
        lib.nfclab_detect_all.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            f32p, f32p, f32p, f32p, f32p, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, i32p, f64p, f32p, f32p, f32p,
            ctypes.c_float, ctypes.c_float,
            ctypes.c_int, i32p, f64p, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            ctypes.c_int, i32p, f64p, ctypes.c_int,
            f32p, f32p, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, i32p, f64p, f32p, ctypes.c_float, ctypes.c_float,
            i64p, ctypes.c_int64,  # candidate union (sorted clocks) + len
        ]
        lib.nfclab_detect_all.restype = ctypes.c_int64
        for name in ("nfclab_box_sum", "nfclab_box_sq"):
            fn = getattr(lib, name)
            fn.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32, f32p]
            fn.restype = None
        lib.nfclab_box_bpsk.argtypes = [
            f32p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            f32p,
        ]
        lib.nfclab_box_bpsk.restype = None
        lib.nfclab_box_multi_ext.restype = None
        lib.nfclab_iq_magnitude.argtypes = [
            f32p,
            ctypes.c_int64,
            f32p,
            f32p,
            f32p,
        ]
        lib.nfclab_iq_magnitude.restype = None
        lib.nfclab_sdr_driver_count.restype = ctypes.c_int
        lib.nfclab_sdr_driver_name.argtypes = [ctypes.c_int]
        lib.nfclab_sdr_driver_name.restype = ctypes.c_char_p
        lib.nfclab_sdr_enumerate.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.nfclab_sdr_enumerate.restype = ctypes.c_int
        for name in (
            "nfclab_detect_sd_af",
            "nfclab_detect_sd_v",
            "nfclab_edge_mask_b",
            "nfclab_collect_gt",
            "nfclab_collect_ge",
            "nfclab_collect_lt",
            "nfclab_detect_sd_af_ext",
            "nfclab_detect_sd_v_ext",
            "nfclab_edge_mask_b_ext",
            "nfclab_collect_gt_ext",
            "nfclab_collect_ge_ext",
            "nfclab_collect_lt_ext",
            "nfclab_collect_cross_gt_ext",
            "nfclab_collect_cross_ge_ext",
            "nfclab_collect_cross_lt_ext",
        ):
            getattr(lib, name).restype = ctypes.c_int64
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.nfclab_detect_stats.argtypes = [i64p, i64p]
        lib.nfclab_detect_stats.restype = None
        lib.nfclab_feed_ext.argtypes = [
            f32p, f32p, f32p, f32p, f32p,
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(NfcFeedJob),
        ]
        lib.nfclab_feed_ext.restype = None
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.nfclab_merge_sorted.argtypes = [
            ctypes.POINTER(i64p), i64p, ctypes.c_int32, i64p, i64p,
        ]
        lib.nfclab_merge_sorted.restype = None
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        _load_error = e
    return _lib


def native_available() -> bool:
    return _load() is not None


def detect_stats_native() -> tuple[int, int]:
    """Process-wide detect-walk counters: (samples skipped by the idle fast
    path, samples stepped through the full state machines)."""
    lib = _load()
    if lib is None:
        return (0, 0)
    sk, st = ctypes.c_int64(), ctypes.c_int64()
    lib.nfclab_detect_stats(ctypes.byref(sk), ctypes.byref(st))
    return sk.value, st.value


def new_stream_state() -> np.ndarray:
    """Fresh conditioning carry for condition_stream."""
    return np.zeros(8, np.float64)


def condition_stream_into(
    value: np.ndarray, params, state: np.ndarray, bufs: dict, lo: int
) -> int:
    """Condition one block directly into the stream buffers at physical
    offset `lo` (zero-copy variant of condition_stream for the windowed
    streaming decoder — avoids fresh per-block output allocations, whose
    first-touch page faults dominate on this VM).  Returns the block
    length."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    value = np.ascontiguousarray(value, dtype=np.float32)
    n = len(value)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    u32p = ctypes.POINTER(ctypes.c_uint32)

    def at(name, ptype):
        arr = bufs[name]
        addr = arr.ctypes.data + lo * arr.itemsize
        return ctypes.cast(ctypes.c_void_p(addr), ptype)

    bufs["value"][lo : lo + n] = value
    lib.nfclab_condition_stream(
        value.ctypes.data_as(f32p),
        ctypes.c_int64(n),
        ctypes.c_float(params.signal_enve_w0),
        ctypes.c_float(params.signal_enve_w1),
        ctypes.c_float(params.signal_mdev_w0),
        ctypes.c_float(params.signal_mdev_w1),
        ctypes.c_float(params.signal_mean_w0),
        ctypes.c_float(params.signal_mean_w1),
        ctypes.c_float(params.signal_iir_dc_a),
        ctypes.c_int32(params.elementary_time_unit),
        ctypes.c_float(params.signal_low_threshold),
        ctypes.c_float(params.signal_high_threshold),
        state.ctypes.data_as(f64p),
        at("envelope", f32p),
        at("filtered", f32p),
        at("deviation", f32p),
        at("average", f32p),
        at("mod_depth", f32p),
        at("edge_peak", f32p),
        at("edge_time", u32p),
    )
    return n


def edge_track_into(
    params, state: np.ndarray, bufs: dict, lo: int, n: int, base: int = 0
) -> None:
    """Run the carrier-edge peak tracker (NfcTech.cpp:77-92) over absolute
    clocks ``[base + lo, base + lo + n)`` reading/writing the physical
    buffers at ``[lo, lo + n)`` — the TPU farm fetches the other
    conditioned channels from the fused device kernel, which does not emit
    the edge tracker.  `state` is a 2-element f64 carry
    [edge_peak, edge_time]; edge_time records the absolute clock (u32,
    wrap-reconstructed by the carrier detector)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    f32p = ctypes.POINTER(ctypes.c_float)
    u32p = ctypes.POINTER(ctypes.c_uint32)

    def at(name, ptype):
        arr = bufs[name]
        addr = arr.ctypes.data - base * arr.itemsize  # virtual pointer
        return ctypes.cast(ctypes.c_void_p(addr), ptype)

    lib.nfclab_edge_track_ext(
        at("filtered", f32p),
        ctypes.c_int64(base + lo),
        ctypes.c_int64(base + lo + n),
        ctypes.c_float(params.signal_low_threshold),
        ctypes.c_float(params.signal_high_threshold),
        state.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        at("edge_peak", f32p),
        at("edge_time", u32p),
    )


def condition_stream(value: np.ndarray, params, state: np.ndarray) -> Conditioned:
    """Incrementally condition one block, updating `state` in place — the
    streaming-exact variant of condition_exact (same math, explicit carry).
    Thin convenience over condition_stream_into with fresh output arrays."""
    value = np.ascontiguousarray(value, dtype=np.float32)
    n = len(value)
    bufs = {
        k: np.empty(n, np.uint32 if k == "edge_time" else np.float32)
        for k in (
            "value", "envelope", "filtered", "deviation",
            "average", "mod_depth", "edge_peak", "edge_time",
        )
    }
    condition_stream_into(value, params, state, bufs, 0)
    return Conditioned(*(bufs[k] for k in (
        "value", "envelope", "filtered", "deviation",
        "average", "mod_depth", "edge_peak", "edge_time",
    )))


def iq_magnitude_native(iq: np.ndarray, avrg: float = 0.0):
    """Native IQ->magnitude (RadioDeviceTask.cpp:560-660 hot loop)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    iq = np.ascontiguousarray(iq, dtype=np.float32)
    n = len(iq)
    mag = np.empty(n, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    avrg_io = ctypes.c_float(avrg)
    power = ctypes.c_float(0.0)
    lib.nfclab_iq_magnitude(
        iq.ctypes.data_as(f32p),
        ctypes.c_int64(n),
        mag.ctypes.data_as(f32p),
        ctypes.byref(avrg_io),
        ctypes.byref(power),
    )
    return mag, float(power.value), float(avrg_io.value)


def sdr_drivers() -> list[str]:
    """Available native SDR capture drivers."""
    lib = _load()
    if lib is None:
        return []
    return [
        lib.nfclab_sdr_driver_name(i).decode()
        for i in range(lib.nfclab_sdr_driver_count())
    ]


def usb_device_list() -> list[str]:
    """'vid:pid bus:addr' lines for every USB device (hw::usb wrapper
    diagnostics; empty when libusb is absent)."""
    lib = _load()
    if lib is None:
        return []
    if not hasattr(lib.nfclab_usb_device_list, "argtypes") or \
            not lib.nfclab_usb_device_list.argtypes:
        lib.nfclab_usb_available.restype = ctypes.c_int
        lib.nfclab_usb_device_list.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.nfclab_usb_device_list.restype = ctypes.c_int
    if not lib.nfclab_usb_available():
        return []
    buf = ctypes.create_string_buffer(8192)
    if lib.nfclab_usb_device_list(buf, len(buf)) < 0:
        return []
    return [s for s in buf.value.decode().splitlines() if s]


def sdr_enumerate(scheme: str | None = None) -> list[str]:
    """Device idents reported by every native driver (optionally filtered
    to one scheme) — DeviceFactory::enumerate parity for the bridge."""
    lib = _load()
    if lib is None:
        return []
    buf = ctypes.create_string_buffer(8192)
    lib.nfclab_sdr_enumerate(buf, len(buf))
    idents = [s for s in buf.value.decode().splitlines() if s]
    if scheme is not None:
        idents = [s for s in idents if s.startswith(scheme + "://")]
    return idents


@dataclass
class Conditioned:
    """Dense per-sample conditioning outputs (the NfcTimeSample fields plus the
    scan states the decoder FSMs read; NfcTech.h:208-216, 317-393)."""

    value: np.ndarray      # raw magnitude samples
    envelope: np.ndarray   # signalEnvelope after this sample
    filtered: np.ndarray   # DC-removed value
    deviation: np.ndarray  # meanDeviation
    average: np.ndarray    # signalAverage
    mod_depth: np.ndarray  # modulateDepth
    edge_peak: np.ndarray  # carrierEdgePeak after this sample
    edge_time: np.ndarray  # carrierEdgeTime after this sample (uint32)


def condition_exact(value: np.ndarray, params) -> Conditioned:
    """Run the exact sequential conditioning oracle (native C++).

    `params` is a nfclab.core.params.SignalParams.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    value = np.ascontiguousarray(value, dtype=np.float32)
    n = len(value)
    env = np.empty(n, np.float32)
    filt = np.empty(n, np.float32)
    mdev = np.empty(n, np.float32)
    avg = np.empty(n, np.float32)
    mdepth = np.empty(n, np.float32)
    epeak = np.empty(n, np.float32)
    etime = np.empty(n, np.uint32)

    f32p = ctypes.POINTER(ctypes.c_float)
    u32p = ctypes.POINTER(ctypes.c_uint32)

    def p(a):
        return a.ctypes.data_as(f32p)

    lib.nfclab_condition(
        p(value),
        ctypes.c_int64(n),
        ctypes.c_float(params.signal_enve_w0),
        ctypes.c_float(params.signal_enve_w1),
        ctypes.c_float(params.signal_mdev_w0),
        ctypes.c_float(params.signal_mdev_w1),
        ctypes.c_float(params.signal_mean_w0),
        ctypes.c_float(params.signal_mean_w1),
        ctypes.c_float(params.signal_iir_dc_a),
        ctypes.c_int32(params.elementary_time_unit),
        ctypes.c_float(params.signal_low_threshold),
        ctypes.c_float(params.signal_high_threshold),
        p(env),
        p(filt),
        p(mdev),
        p(avg),
        p(mdepth),
        p(epeak),
        etime.ctypes.data_as(u32p),
    )
    return Conditioned(value, env, filt, mdev, avg, mdepth, epeak, etime)


def _box_call(name, x, *args):
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(len(x), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    getattr(lib, name)(
        x.ctypes.data_as(f32p),
        ctypes.c_int64(len(x)),
        *[ctypes.c_int32(a) for a in args],
        out.ctypes.data_as(f32p),
    )
    return out


def box_sum_native(x, width):
    return _box_call("nfclab_box_sum", x, width)




def _collect_cmp(name, x, thr):
    lib = _load()
    n = len(x)
    idx = np.empty(n, np.int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    count = getattr(lib, name)(
        x.ctypes.data_as(f32p),
        ctypes.c_int64(n),
        ctypes.c_float(float(thr)),
        idx.ctypes.data_as(i64p),
    )
    return idx[:count].copy()


def collect_gt_native(x, thr):
    """Indices where x > thr (full range, one pass)."""
    return _collect_cmp("nfclab_collect_gt", x, thr)






_scratch_tls = None


def _idx_scratch(n: int) -> np.ndarray:
    """Reusable per-thread int64 scratch for index scans (fresh per-call
    allocations page-fault on this VM; the scratch stays warm).  Contents
    are only valid until the same thread's next scan — callers copy out
    immediately.  Thread-local so concurrent decoders (live pipeline +
    batch) never alias."""
    global _scratch_tls
    if _scratch_tls is None:
        import threading

        _scratch_tls = threading.local()
    buf = getattr(_scratch_tls, "buf", None)
    if buf is None or len(buf) < n:
        buf = alloc_array(max(n, 1 << 16), np.int64)
        _scratch_tls.buf = buf
    return buf


def box_ext_native(kind, src, start, n, width, lag, acc, arr, base=0):
    """Extend a box channel over absolute clocks [start, n) continuing the
    f64 running sum (bit-identical to a fresh full pass).  kind: 'sum' |
    'sq' | 'bpsk'.  `base` is the stream-window origin: `src` may be a
    StreamView and `arr` holds clocks [base, ...), so both are addressed
    through virtual pointers the kernels index with absolute clocks."""
    from ..core.streamview import as_f32_ptr

    lib = _load()
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    src_p = as_f32_ptr(src)
    out_addr = arr.ctypes.data - base * arr.itemsize
    out_p = ctypes.cast(ctypes.c_void_p(out_addr), f32p)
    acc_p = acc.ctypes.data_as(f64p)
    if kind == "sum":
        lib.nfclab_box_sum_ext(
            src_p, ctypes.c_int64(n), ctypes.c_int64(start),
            ctypes.c_int32(width), acc_p, out_p,
        )
    elif kind == "sq":
        lib.nfclab_box_sq_ext(
            src_p, ctypes.c_int64(n), ctypes.c_int64(start),
            ctypes.c_int32(width), acc_p, out_p,
        )
    else:
        lib.nfclab_box_bpsk_ext(
            src_p, ctypes.c_int64(n), ctypes.c_int64(start),
            ctypes.c_int32(lag), ctypes.c_int32(width), acc_p, out_p,
        )


def box_multi_ext_native(value, filt, n, base, jobs):
    """Extend K box channels over their [start, n) tails in one native pass
    (fused source reads; per-channel math identical to box_ext_native).
    jobs: list of (kind_code, width, lag, start, acc_arr, out_arr) with
    kind_code 0=sum(value) 1=sq(filtered) 2=bpsk(filtered, lag); out_arr
    holds clocks [base, ...) and is addressed via a virtual pointer."""
    from ..core.streamview import as_f32_ptr

    lib = _load()
    k = len(jobs)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    kinds = np.fromiter((j[0] for j in jobs), np.int32, k)
    widths = np.fromiter((j[1] for j in jobs), np.int32, k)
    lags = np.fromiter((j[2] for j in jobs), np.int32, k)
    starts = np.fromiter((j[3] for j in jobs), np.int64, k)
    accs = (f64p * k)(*(j[4].ctypes.data_as(f64p) for j in jobs))
    outs = (f32p * k)(
        *(
            ctypes.cast(
                ctypes.c_void_p(j[5].ctypes.data - base * j[5].itemsize), f32p
            )
            for j in jobs
        )
    )
    lib.nfclab_box_multi_ext(
        as_f32_ptr(value),
        as_f32_ptr(filt),
        ctypes.c_int64(n),
        ctypes.c_int32(k),
        kinds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lags.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        accs,
        outs,
    )


def detect_sd_idx_ext_native(
    box, env, start, n, d, p1, p2, corr_thr, power_thr, signed_v, sd_arr=None
):
    """Extend the fused detect-index scan over [start, n); returns the new
    indices.  sd_arr is optional (the FSMs read SD on the fly from box)."""
    from ..core.streamview import as_f32_ptr

    lib = _load()
    idx = _idx_scratch(max(n - start, 1))
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    fn = lib.nfclab_detect_sd_v_ext if signed_v else lib.nfclab_detect_sd_af_ext
    count = fn(
        as_f32_ptr(box),
        as_f32_ptr(env),
        ctypes.c_int64(n),
        ctypes.c_int64(start),
        ctypes.c_int32(d),
        ctypes.c_int32(p1),
        ctypes.c_int32(p2),
        ctypes.c_float(float(corr_thr)),
        ctypes.c_float(float(power_thr)),
        sd_arr.ctypes.data_as(f32p) if sd_arr is not None else None,
        idx.ctypes.data_as(i64p),
    )
    return idx[:count]  # scratch view; consume before the next scan


def edge_mask_b_ext_native(filt, env, start, n, d, min_deep, power_thr):
    """NFC-B trigger indices over [start, n)."""
    from ..core.streamview import as_f32_ptr

    lib = _load()
    idx = _idx_scratch(max(n - start, 1))
    i64p = ctypes.POINTER(ctypes.c_int64)
    count = lib.nfclab_edge_mask_b_ext(
        as_f32_ptr(filt),
        as_f32_ptr(env),
        ctypes.c_int64(n),
        ctypes.c_int64(start),
        ctypes.c_int32(d),
        ctypes.c_float(float(min_deep)),
        ctypes.c_float(float(power_thr)),
        idx.ctypes.data_as(i64p),
    )
    return idx[:count]  # scratch view; consume before the next scan


def collect_cmp_ext_native(x, start, n, thr, op):
    """Threshold indices over [start, n)."""
    from ..core.streamview import as_f32_ptr

    lib = _load()
    name = {
        ">": "nfclab_collect_gt_ext",
        ">=": "nfclab_collect_ge_ext",
        "<": "nfclab_collect_lt_ext",
    }[op]
    idx = _idx_scratch(max(n - start, 1))
    i64p = ctypes.POINTER(ctypes.c_int64)
    count = getattr(lib, name)(
        as_f32_ptr(x),
        ctypes.c_int64(n),
        ctypes.c_int64(start),
        ctypes.c_float(float(thr)),
        idx.ctypes.data_as(i64p),
    )
    return idx[:count]  # scratch view; consume before the next scan


def collect_cross_ext_native(x, start, n, thr, op):
    """Rising-crossing indices over [start, n): clocks where (x OP thr)
    becomes true.  Reads x[start-1] when start > 0 (callers keep start
    inside the stream window)."""
    from ..core.streamview import as_f32_ptr

    lib = _load()
    name = {
        ">": "nfclab_collect_cross_gt_ext",
        ">=": "nfclab_collect_cross_ge_ext",
        "<": "nfclab_collect_cross_lt_ext",
    }[op]
    idx = _idx_scratch(max(n - start, 1))
    i64p = ctypes.POINTER(ctypes.c_int64)
    count = getattr(lib, name)(
        as_f32_ptr(x),
        ctypes.c_int64(n),
        ctypes.c_int64(start),
        ctypes.c_float(float(thr)),
        idx.ctypes.data_as(i64p),
    )
    return idx[:count]  # scratch view; consume before the next scan




_merge_tls = None


def _merge_scratch(n: int) -> np.ndarray:
    """Reused per-thread int64 scratch for the k-way merge (fresh pages
    would refault every call on this host — see CLAUDE.md env notes).
    Thread-local: decode_batch merges from concurrent workers."""
    global _merge_tls
    if _merge_tls is None:
        import threading

        _merge_tls = threading.local()
    buf = getattr(_merge_tls, "buf", None)
    if buf is None or len(buf) < n:
        buf = _merge_tls.buf = np.empty(max(n, 1 << 16), np.int64)
    return buf


def merge_sorted_native(parts: list[np.ndarray]) -> np.ndarray | None:
    """K-way merge of sorted int64 index arrays (the detect-candidate
    union) — O(n log k) sequential passes, no concatenate copy + sort.
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    k = len(parts)
    total = sum(len(p) for p in parts)
    out = np.empty(total, np.int64)
    scratch = _merge_scratch(total)
    i64p = ctypes.POINTER(ctypes.c_int64)
    ptrs = (i64p * k)(*(p.ctypes.data_as(i64p) for p in parts))
    lens = np.array([len(p) for p in parts], np.int64)
    lib.nfclab_merge_sorted(
        ptrs, lens.ctypes.data_as(i64p), ctypes.c_int32(k),
        out.ctypes.data_as(i64p), scratch.ctypes.data_as(i64p),
    )
    return out
