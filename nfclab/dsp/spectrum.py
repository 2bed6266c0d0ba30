"""Spectrum processor: windowed FFT of the IQ stream.

Parity with ``FourierProcessTask`` (FourierProcessTask.cpp:85-330): 1024-point
C2C FFT over decimated IQ, Hamming/Hann windowing (:122-140 — note the
reference's "Hamming" is actually a sin^2 Hann), magnitude, fftshift.  Here
the whole chain is one jitted JAX program batched over frames — the TPU-native
replacement for the task's hand-written SSE loops.
"""

from __future__ import annotations

import functools

import numpy as np

WINDOW_NONE = 0
WINDOW_HAMMING = 1
WINDOW_HANN = 2


def make_window(length: int, window: int) -> np.ndarray:
    n = np.arange(length, dtype=np.float64)
    if window == WINDOW_HAMMING:
        # FourierProcessTask.cpp:126-129 ("Hamming" label, sin^2 shape)
        w = np.sin(np.pi * n / length) ** 2
    elif window == WINDOW_HANN:
        w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / (length - 1)))
    else:
        w = np.ones(length)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _jitted(length: int, window: int, decimation: int):
    import jax
    import jax.numpy as jnp

    win = make_window(length, window)

    def run(iq):  # [B, length*decimation, 2] float32
        x = iq[:, :: decimation, :]
        x = x[:, :length, :]
        z = (x[..., 0] + 1j * x[..., 1]) * win
        f = jnp.fft.fft(z, axis=-1)
        mag = jnp.abs(f).astype(jnp.float32)
        return jnp.fft.fftshift(mag, axes=-1)

    return jax.jit(run)


class SpectrumProcessor:
    """Streaming 1024-bin spectrum over IQ blocks (default ~10 ms cadence at
    the task level; here a pure function over the latest block)."""

    def __init__(self, length: int = 1024, window: int = WINDOW_HAMMING,
                 bandwidth: float = 10e6):
        self.length = length
        self.window = window
        self.bandwidth = bandwidth

    def process(self, iq: np.ndarray, sample_rate: int) -> np.ndarray:
        """iq: [N, 2] or [B, N, 2] float32; returns [*, length] magnitudes
        (fftshifted, centered on the tuned frequency)."""
        decimation = max(1, int(sample_rate / self.bandwidth))
        batched = iq.ndim == 3
        if not batched:
            iq = iq[None]
        need = self.length * decimation
        if iq.shape[1] < need:
            raise ValueError(f"need at least {need} IQ samples")
        fn = _jitted(self.length, self.window, decimation)
        out = np.asarray(fn(iq[:, :need].astype(np.float32)))
        return out if batched else out[0]
