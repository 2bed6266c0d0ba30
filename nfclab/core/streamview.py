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
