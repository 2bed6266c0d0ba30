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

    def sync(res):
        # block_until_ready does NOT block through a tunnel-attached chip
        # (CLAUDE.md env notes): force completion by fetching a device-side
        # scalar — in-order execution makes earlier dispatches complete too
        leaf = jax.tree_util.tree_leaves(res)[0]
        return float(leaf.sum())

    sync(fn(dev))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(dev)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    rate = batch * span / dt
    return {
        "metric": "frontend_samples_per_second",
        "value": rate,
        "unit": "samples/s",
    }


def bench_decode(
    paths: list[str], frontend: str = "host", workers: int | None = None,
    conditioner: str = "native", pool: str = "process",
    keep_pool: bool = False,
) -> dict:
    """Honest capture->frames rate: WAV read + frontend (host or the fused
    TPU kernel via dsp.tpu_channels) + the host event walk, wall clock.
    This is the aggregate number a deployment sees, host-walk-bound —
    orders of magnitude below the kernel-only GS/s figure."""
    from ..io.wav import read_wav
    from ..runtime.batch import decode_batch

    total = sum(len(read_wav(p)[0]) for p in paths)
    t0 = time.perf_counter()
    results = decode_batch(
        paths, workers=workers, frontend=frontend, conditioner=conditioner,
        pool=pool, keep_pool=keep_pool,
    )
    dt = time.perf_counter() - t0
    frames = sum(len(v) for v in results.values())
    return {
        "metric": "end_to_end_decode_samples_per_second",
        "frontend": frontend,
        "value": total / dt,
        "unit": "samples/s",
        "captures": len(paths),
        "frames": frames,
    }


def main(argv=None) -> int:
    from ..core.malloc_tune import malloc_tune

    malloc_tune()  # bench-only: recycle large buffers without refaulting
    ap = argparse.ArgumentParser(prog="nfclab-bench")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--span", type=int, default=81920)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--decode", nargs="*", help="wav files for end-to-end bench")
    ap.add_argument(
        "--frontend", choices=["host", "fused", "mask"], default="host",
        help="decode frontend: host channels, the fused TPU kernel "
        "(channels + masks fetched), or mask (1-byte/sample detect masks "
        "only — the lightest device frontend)",
    )
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument(
        "--pool", choices=["process", "thread"], default="process",
        help="walk fan-out: spawned processes, or threads (GIL-free "
        "native walks; no interpreter boot / pickling overhead)",
    )
    ap.add_argument(
        "--conditioner", choices=["native", "jax", "device"],
        default="native",
        help="conditioning backend: native/jax for frontend=host; device "
        "fetches kernel conditioning too for frontend=fused (PCIe hosts)",
    )
    ap.add_argument(
        "--no-kernel", action="store_true",
        help="skip the dense-frontend kernel bench (decode only)",
    )
    args = ap.parse_args(argv)
    if not args.no_kernel:
        print(json.dumps(bench_frontend(args.batch, args.span, args.reps)))
    if args.decode:
        print(json.dumps(
            bench_decode(
                args.decode, args.frontend, args.workers, args.conditioner,
                args.pool,
            )
        ))
    return 0


if __name__ == "__main__":
    sys.exit(main())
