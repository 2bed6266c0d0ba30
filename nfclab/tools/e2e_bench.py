"""Honest end-to-end capture->frames benchmark + link characterization.

Produces the E2E_r{N}.json artifact: aggregate samples/s over the full
reference fixture suite for every frontend (host / fused / mask), plus the
measured host<->device link figures that explain the frontend ranking on
the current attachment.

The kernel-only GS/s figure (bench.py) and these capture->frames figures
are DIFFERENT claims: bench.py measures the device hot path on
device-resident data with carried state; this tool measures the whole
system including WAV read, host conditioning, host<->device transfers, and
the event walk — what a deployment actually sees.

On a tunnel-attached chip (this dev host: ~15 MB/s up / ~35 MB/s down,
~30 ms dispatch floor) every device frontend is link-bound and the host
frontend wins; on a PCIe/ICI attachment (>=10 GB/s) the same code is
walk-bound and the device frontends win.  The crossover alpha math is in
the artifact.

Usage: python -m nfclab.tools.e2e_bench [--out E2E.json] [wav_dir]
"""

from __future__ import annotations

import json
import sys
import time


def _measure_link() -> dict:
    """Host<->device transfer rates with dependent-sync timing
    (block_until_ready does not block through the axon tunnel)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sync = jax.jit(lambda a: jnp.sum(a[:, -1].astype(jnp.float32)))
    x = np.random.rand(256, 32768).astype(np.float32)  # 32 MB
    d = jax.device_put(x)
    float(sync(d))  # warm program + backend

    t0 = time.perf_counter()
    d = jax.device_put(x)
    float(sync(d))
    up = x.nbytes / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    h = np.asarray(d)
    down = h.nbytes / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    for _ in range(5):
        float(sync(d))
    dispatch = (time.perf_counter() - t0) / 5
    return {
        "upload_MBps": round(up / 1e6, 1),
        "download_MBps": round(down / 1e6, 1),
        "dispatch_floor_s": round(dispatch, 3),
    }


def _burn(n: int = 12_000_000) -> float:
    x = 0
    t0 = time.perf_counter()
    for i in range(n):
        x += i * i
    return time.perf_counter() - t0


def _cpu_capacity() -> dict:
    """Calibrate how much PARALLEL cpu this host actually delivers: a
    pure-Python burn single vs two concurrent processes.  Cloud VMs
    advertise N vcpus but may deliver ~1 core of cycles (observed on this
    host class: two burns take exactly 2x one burn — zero parallelism);
    the walk-scaling curve is only interpretable against this ceiling."""
    import multiprocessing as mp

    single = min(_burn(), _burn())
    ctx = mp.get_context("fork")
    t0 = time.perf_counter()
    ps = [ctx.Process(target=_burn) for _ in range(2)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    dual = time.perf_counter() - t0
    speedup = 2.0 * single / dual if dual > 0 else 0.0
    return {
        "burn_single_s": round(single, 3),
        "burn_dual_wall_s": round(dual, 3),
        "parallel_speedup_ceiling": round(speedup, 2),
    }


def main(argv=None) -> int:
    import argparse
    import glob

    from ..apps.bench_cli import bench_decode
    from ..core.malloc_tune import malloc_tune

    malloc_tune()  # bench-only: recycle large buffers without refaulting

    ap = argparse.ArgumentParser(prog="nfclab-e2e-bench")
    ap.add_argument("wav_dir", nargs="?", default="/root/reference/wav")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--frontends", nargs="*", default=["host", "mask", "fused"]
    )
    ap.add_argument("--reps", type=int, default=2,
                    help="per frontend; best rep is reported (first rep "
                    "pays jit/persistent-cache loads)")
    args = ap.parse_args(argv)

    paths = sorted(glob.glob(f"{args.wav_dir}/*.wav"))
    out: dict = {"fixtures": len(paths), "modes": {}}

    # ---- aggregate (multi-worker) scaling curve FIRST, before any device
    # frontend loads jax: XLA's in-process service threads contend with the
    # walk thread pool on few-core hosts (measured 16.6 vs 30.3 MS/s for
    # thread_x2 with/without a live jax runtime on this 2-core VM)
    import os as _os

    ncpu = _os.cpu_count() or 1
    cap = _cpu_capacity()
    out["aggregate_scaling"] = {
        "cpus": ncpu, "cpu_capacity": cap, "curve": [],
    }
    configs = [("serial", "process", 1, False)]
    for w in range(2, ncpu + 1):
        configs.append((f"thread_x{w}", "thread", w, False))
    if ncpu >= 2:
        configs.append((f"process_x{ncpu}", "process", ncpu, True))
    base = None
    for label, pool, w, kp in configs:
        best = None
        # best-of-6: this VM's page-fault path oscillates (CLAUDE.md env
        # notes), so single reps under-read by up to 2x
        for _ in range(max(args.reps, 6)):
            r = bench_decode(
                paths, frontend="host", workers=w, pool=pool, keep_pool=kp
            )
            if best is None or r["value"] > best["value"]:
                best = r
        entry = {
            "config": label,
            "workers": w,
            "pool": pool,
            "value": round(best["value"]),
            "unit": "samples/s",
        }
        if kp:
            entry["persistent_pool"] = True
        if label == "serial":
            base = best["value"]
        elif base:
            entry["speedup_vs_serial"] = round(best["value"] / base, 3)
            if cap["parallel_speedup_ceiling"] > 0:
                entry["efficiency_vs_cpu_ceiling"] = round(
                    (best["value"] / base)
                    / min(cap["parallel_speedup_ceiling"], w), 3,
                )
        out["aggregate_scaling"]["curve"].append(entry)
    from ..runtime.batch import shutdown_pools

    shutdown_pools()
    out["aggregate_scaling"]["note"] = (
        "capture->frames over the full fixture suite; the host walk is the "
        "ceiling (CPU-bound). Aggregate deployment rate = per_core_rate x "
        "cores x hosts; the device kernel (BENCH GS/s) never binds. "
        "speedups are only meaningful against cpu_capacity."
        "parallel_speedup_ceiling — this host class advertises 2 vcpus "
        "but can deliver ~1 core of cycles (two pure-CPU burns then take "
        "2x one burn and NO pool can beat serial; "
        "efficiency_vs_cpu_ceiling normalizes for it). The process pool "
        "is persistent (fork when jax is not live, path-only jobs, warm "
        "worker heaps — see runtime/batch.persistent_pool). Measured "
        "before jax loads (XLA service threads otherwise contend with "
        "the walk pool)."
    )

    for frontend in args.frontends:
        best = None
        for _ in range(args.reps):
            r = bench_decode(paths, frontend=frontend)
            if best is None or r["value"] > best["value"]:
                best = r
        best["value"] = round(best["value"])
        out["modes"][frontend] = best

    try:
        out["link"] = _measure_link()
    except Exception as e:  # no device: host-only artifact
        out["link"] = {"error": repr(e)}

    # device-frontend traffic per sample (f32 in; per-mode fetch out)
    out["bytes_per_sample"] = {
        "upload_i16_input": 2.0,
        "upload_f32_input_offgrid": 4.0,
        "fused_fetch": 37.0,  # 9 box f32 + mask u8
        "mask_fetch": 1.0,
    }
    out["note"] = (
        "capture->frames aggregate over the full fixture suite, wall "
        "clock, serial host walk. Device frontends are link-bound on a "
        "tunnel attachment: frontend rate <= link_Bps / bytes_per_sample "
        "(upload and fetch each bound it). The kernel-only GS/s figure in "
        "BENCH_r*.json is a different claim (device-resident hot path)."
    )
    text = json.dumps(out, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(text + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
