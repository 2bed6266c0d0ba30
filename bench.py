"""Throughput benchmark: magnitude samples/s through the dense decode frontend.

Measures the full TPU hot path (Pallas conditioning scan + correlator
channels + detect masks — everything the host symbol walk consumes) on one
chip, batched over overlap-save blocks.

Measurement notes: on the axon platform `block_until_ready` does not force
remote completion, so each repetition is synchronized by fetching a scalar
device-side reduction over every output; the per-call dispatch floor
(~30 ms through the tunnel) is INCLUDED — the figure is honest end-to-end
throughput for one dispatched batch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the build target is >1 GS/s aggregate on a v5p-16 (16 chips), i.e.
62.5 MS/s per chip (BASELINE.md); vs_baseline is the ratio against that
per-chip share.  The reference C++ decoder sustains ~10 MS/s per desktop CPU.
"""

import json
import os
import time

import numpy as np

PER_CHIP_BASELINE = 62.5e6  # 1 GS/s / 16 chips (BASELINE.md)

# persistent XLA compilation cache so repeat runs skip the multi-minute
# first compile of the Pallas kernels
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")


def main():
    import jax

    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from nfclab.core.params import SignalParams
    from nfclab.dsp.frontend import make_fused_frontend

    frontend = make_fused_frontend(SignalParams(10_000_000))
    # one scalar per output forces full execution before the host timestamp
    red = jax.jit(
        lambda x: sum(jnp.sum(v[:, -1]) for v in frontend(x).values())
    )

    rng = np.random.default_rng(0)
    batch, span = 2048, 65536 + 16384
    blocks = (rng.random((batch, span), dtype=np.float32) * 0.4).astype(np.float32)
    dev = jax.device_put(blocks)

    float(red(dev))  # warmup / compile

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        float(red(dev))
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
