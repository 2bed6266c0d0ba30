"""Validate the RATE-PARAMETRIC fused kernel on real hardware: device
frontends at non-10 MS/s capture rates must produce exactly the frames the
(rate-generic, golden-proven) host path produces.

Covers the reference's own rate flexibility (NfcDecoder.cpp:382-388
re-derives the bitrate tables on any sample-rate change):

- 3.2 MS/s 8-bit (the RTL-SDR degraded mode, README.md:193-201),
- 8 MS/s (a resampled capture).

For each rate: host decode vs the mask frontend (sparse chained triggers,
host channels) vs the fused channel frontend (kernel box channels + sparse
triggers).  Frame lists must be EQUAL (the device frontends feed the same
walk, margins only ever add re-checked candidates).

Run: python -m nfclab.tools.validate_rate_parametric
Prints one OK/MISMATCH line per (rate, frontend); exits non-zero on any
mismatch.
"""

from __future__ import annotations

import os
import sys

import numpy as np

WAV_DIR = "/root/reference/wav"
SOURCE = "test_NFC-A_106kbps_001.wav"


def _resampled(samples: np.ndarray, src_rate: int, rate: int,
               bits8: bool) -> np.ndarray:
    t_old = np.arange(len(samples)) / src_rate
    n_new = int(len(samples) * rate / src_rate)
    x = np.interp(np.arange(n_new) / rate, t_old, samples)
    if bits8:
        x = np.round(x * 255) / np.float32(255)
    return x.astype(np.float32)


def main(argv=None) -> int:
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from ..dsp.tpu_channels import chained_batch_masks, fused_batch_channels
    from ..io.wav import read_wav
    from ..runtime.decoder import NfcDecoder

    samples, info = read_wav(os.path.join(WAV_DIR, SOURCE))

    bad = 0
    for rate, bits8 in ((3_200_000, True), (8_000_000, False)):
        x = _resampled(samples, info.sample_rate, rate, bits8)
        host = NfcDecoder().decode(x.copy(), rate)
        assert host, "host decode produced no frames — fixture problem"

        mask = chained_batch_masks([x], rate)[0]
        got_mask = NfcDecoder().decode(x.copy(), rate, tpu_channels=mask)

        chans = fused_batch_channels([x], rate)[0]
        got_fused = NfcDecoder().decode(x.copy(), rate, tpu_channels=chans)

        for label, got in (("mask", got_mask), ("fused", got_fused)):
            ok = got == host
            print(
                f"RATE {rate/1e6:.1f} MS/s [{label}]: "
                f"{'OK' if ok else 'MISMATCH'} "
                f"({len(got)} vs {len(host)} frames)",
                flush=True,
            )
            if not ok:
                bad += 1
                for i, (a, b) in enumerate(zip(host, got)):
                    if a != b:
                        print(f"  first diff at frame {i}: {a} vs {b}")
                        break
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
