"""Throughput benchmark: magnitude samples/s through the dense decode frontend.

Measures the full TPU hot path (conditioning scan + all per-tech correlator
channels + detect masks — everything the host symbol walk consumes) on one
chip, batched over overlap-save blocks.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the build target is >1 GS/s aggregate on a v5p-16 (16 chips), i.e.
62.5 MS/s per chip (BASELINE.md); vs_baseline is the per-chip ratio against
that share.  The reference C++ decoder sustains ~10 MS/s per desktop CPU (it
decodes 10 MS/s captures in real time on "a recent computer", README.md:359).
"""

import json
import sys
import time

import numpy as np

PER_CHIP_BASELINE = 62.5e6  # 1 GS/s / 16 chips (BASELINE.md)


def main():
    from nfclab.dsp.frontend import jitted_frontend

    fn = jitted_frontend(10_000_000)

    rng = np.random.default_rng(0)
    batch, span = 64, 65536 + 16384
    blocks = (rng.random((batch, span), dtype=np.float32) * 0.4).astype(np.float32)

    import jax

    dev_blocks = jax.device_put(blocks)

    # warmup / compile
    out = fn(dev_blocks)
    jax.block_until_ready(out)

    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(dev_blocks)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    # throughput counts kept samples only (the halo is overlap-save overhead)
    kept = batch * 65536
    rate = kept / dt

    print(
        json.dumps(
            {
                "metric": "frontend_samples_per_second_per_chip",
                "value": rate,
                "unit": "samples/s",
                "vs_baseline": rate / PER_CHIP_BASELINE,
            }
        )
    )


if __name__ == "__main__":
    main()
