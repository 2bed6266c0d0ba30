"""Absolute-clock views over windowed stream buffers.

The streaming decoder keeps only the trailing window of every dense array
(conditioned channels, correlator channels); all FSM state and event indices
use absolute stream clocks.  A ``StreamView`` presents the physical window
``data`` (holding clocks ``[base, base + len(data))``) as if it were the
whole stream:

- ``view[t]`` / ``view[t0:t1]`` / fancy indexing translate by ``base``;
- ``len(view)`` is the absolute stream end (so ``n = len(x)`` idioms hold);
- native kernels receive a *virtual pointer* ``data_ptr - base * itemsize``
  and keep indexing with absolute clocks (they never dereference below
  ``base``, which the window size guarantees).

``base == 0`` degenerates to plain array behavior (the batch decoder path
passes raw ndarrays; every consumer handles both).
"""

from __future__ import annotations

import ctypes

import numpy as np


class StreamView:
    __slots__ = ("data", "base")

    def __init__(self, data: np.ndarray, base: int):
        self.data = data
        self.base = base

    def __len__(self) -> int:
        return self.base + len(self.data)

    @property
    def dtype(self):
        return self.data.dtype

    def __getitem__(self, i):
        b = self.base
        if isinstance(i, slice):
            start = None if i.start is None else i.start - b
            stop = None if i.stop is None else i.stop - b
            return self.data[start:stop:i.step]
        return self.data[i - b]

    def __setitem__(self, i, value):
        b = self.base
        if isinstance(i, slice):
            start = None if i.start is None else i.start - b
            stop = None if i.stop is None else i.stop - b
            self.data[start:stop:i.step] = value
            return
        self.data[i - b] = value

    def vptr(self, ctype=ctypes.c_float):
        """Virtual pointer so native kernels index by absolute clock."""
        addr = self.data.ctypes.data - self.base * self.data.itemsize
        return ctypes.cast(ctypes.c_void_p(addr), ctypes.POINTER(ctype))


def as_f32_ptr(x):
    """float* for an ndarray or StreamView (virtual when windowed)."""
    if isinstance(x, StreamView):
        return x.vptr(ctypes.c_float)
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def stream_len(x) -> int:
    """Absolute stream length for ndarray or StreamView."""
    return len(x)


class DerivedView:
    """On-the-fly derived listen channel over a box channel — the dense
    equivalents (s0q_t / pb4_t / vq_t) materialized one f32 op per read
    instead of one array per feed:

        view[t] = src[t - oa] - src[t - ob]   (ob is not None)
        view[t] = src[t - oa]                 (ob is None; delayed copy)
        view[t] = 0.0                         (t < lo: warm-up window)

    Bit-exact with the dense builders (same single f32 subtract on the same
    f32 box values).  `src` is an ndarray (batch path) or StreamView
    (windowed path); native FSMs receive the raw box pointer plus
    (oa, ob, lo) and inline the same expression (fsm_common.h)."""

    __slots__ = ("src", "oa", "ob", "lo")

    def __init__(self, src, oa: int, ob: int | None, lo: int):
        self.src = src
        self.oa = oa
        self.ob = ob
        self.lo = lo

    def __len__(self) -> int:
        return stream_len(self.src)

    def __getitem__(self, i):
        src, oa, ob, lo = self.src, self.oa, self.ob, self.lo
        if isinstance(i, slice):
            t0 = 0 if i.start is None else i.start
            t1 = len(self) if i.stop is None else i.stop
            if i.step not in (None, 1):
                raise IndexError("DerivedView slices must be contiguous")
            t1 = max(t0, t1)
            z = min(max(t0, lo), t1)
            out = np.zeros(t1 - t0, np.float32)
            if z < t1:
                a = src[z - oa : t1 - oa]
                out[z - t0 :] = a if ob is None else a - src[z - ob : t1 - ob]
            return out
        if i < lo:
            return _F32_ZERO
        a = src[i - oa]
        return a if ob is None else a - src[i - ob]


_F32_ZERO = np.float32(0.0)
