"""Throughput benchmark CLI: dense frontend samples/s on the current device.

Measures the TPU hot path (conditioning + correlator channels + masks) and,
optionally, the full end-to-end decode rate over the bundled captures.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def bench_frontend(batch: int, span: int, reps: int) -> dict:
    import jax

    from ..dsp.frontend import jitted_frontend

    fn = jitted_frontend(10_000_000)
    rng = np.random.default_rng(0)
    blocks = (rng.random((batch, span), dtype=np.float32) * 0.4).astype(np.float32)
    dev = jax.device_put(blocks)
    jax.block_until_ready(fn(dev))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(dev)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    rate = batch * span / dt
    return {
        "metric": "frontend_samples_per_second",
        "value": rate,
        "unit": "samples/s",
    }


def bench_decode(paths: list[str]) -> dict:
    from ..io.wav import read_wav
    from ..runtime.decoder import NfcDecoder

    total = 0
    t0 = time.perf_counter()
    for p in paths:
        samples, info = read_wav(p)
        NfcDecoder().decode(samples, info.sample_rate)
        total += len(samples)
    dt = time.perf_counter() - t0
    return {
        "metric": "end_to_end_decode_samples_per_second",
        "value": total / dt,
        "unit": "samples/s",
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nfclab-bench")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--span", type=int, default=81920)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--decode", nargs="*", help="wav files for end-to-end bench")
    args = ap.parse_args(argv)
    print(json.dumps(bench_frontend(args.batch, args.span, args.reps)))
    if args.decode:
        print(json.dumps(bench_decode(args.decode)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
