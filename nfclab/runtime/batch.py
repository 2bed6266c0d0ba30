"""Batch decode: many captures through one TPU conditioning pass, parallel
host symbol walks.

This is the data-parallel throughput configuration (SURVEY.md §2.10): the
dense frontend batches across captures on the device (the `stream` mesh axis
in the multi-chip case), while the thin event walks fan out over host worker
processes — the TPU-native replacement for the reference's one-thread-per-
task pool.
"""

from __future__ import annotations

import multiprocessing
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from ..core.frame import Frame
from ..core.params import SignalParams
from ..io.wav import read_wav
from .decoder import NfcDecoder

# job list inherited by fork-pool workers (copy-on-write pages: no sample
# pickling, no interpreter boot — see _fork_ok)
_FORK_JOBS: list | None = None


def _walk_fork(i: int) -> list[Frame]:
    return _walk_one(_FORK_JOBS[i])


# ------------------------------------------------------- persistent pool
# Deployment-shaped worker pool: processes stay alive across decode_batch
# calls so their heaps stay warm (this class of VM serializes page faults
# through a userspace memory backend — fresh workers re-fault ~100 MB of
# buffers per capture and the fault path, not the CPU, caps throughput;
# with malloc-tuned persistent workers every buffer recycles after the
# first call).  Jobs are PATHS, not samples: each worker reads + conditions
# + walks its captures end to end, so nothing big crosses the pipe in
# either direction but the frames.

_PERSIST: dict[int, object] = {}


def _persist_init() -> None:
    from ..core.malloc_tune import malloc_tune

    malloc_tune()


def _walk_path(args) -> list[Frame]:
    path, kwargs = args
    samples, info = read_wav(path)
    dec = NfcDecoder(**kwargs)
    return dec.decode(samples, info.sample_rate)


def persistent_pool(workers: int) -> ProcessPoolExecutor:
    """Shared long-lived worker pool (fork when safe, else spawn)."""
    ex = _PERSIST.get(workers)
    if ex is None:
        ctx = "fork" if _fork_ok() else "spawn"
        ex = ProcessPoolExecutor(
            max_workers=workers,
            mp_context=multiprocessing.get_context(ctx),
            initializer=_persist_init,
        )
        _PERSIST[workers] = ex
    return ex


def shutdown_pools() -> None:
    for ex in _PERSIST.values():
        ex.shutdown()
    _PERSIST.clear()


def _fork_ok() -> bool:
    """Fork workers are safe (and ~3 s/worker cheaper than spawn on this
    class of host: interpreter boot alone is ~2 s user-CPU) only while the
    parent is single-threaded and has no LIVE XLA backend — forking a
    process with XLA service threads risks deadlocked children.  A merely
    imported jax module is fine (no threads until first backend use);
    XLA's C++ threads don't register with `threading`, so the backend
    registry is checked directly."""
    import sys
    import threading

    if not hasattr(os, "fork"):
        return False
    if threading.active_count() > 1:
        return False
    xb = sys.modules.get("jax._src.xla_bridge")
    if xb is not None and getattr(xb, "_backends", None):
        return False
    return True


def _walk_one(args) -> list[Frame]:
    """Host-side walk over precomputed conditioning (runs in a worker
    process; imports stay local so workers never touch the TPU).
    cond_arrays=None means the worker conditions locally with the native
    C++ chain — the dominant host cost, parallelized across the pool."""
    samples, sample_rate, cond_arrays, tpu_channels, kwargs = args
    dec = NfcDecoder(**kwargs)
    if cond_arrays is None:
        return dec.decode(samples, sample_rate, tpu_channels=tpu_channels)
    from ..native.binding import Conditioned

    cond = Conditioned(*cond_arrays)
    return dec.decode(
        samples, sample_rate, cond=cond, tpu_channels=tpu_channels
    )


def decode_batch(
    paths: list[str],
    workers: int | None = None,
    conditioner: str = "jax",
    frontend: str = "host",
    pool: str = "process",
    keep_pool: bool = False,
    **decoder_kwargs,
) -> dict[str, list[Frame]]:
    """Decode many wav captures: conditioning on the accelerator (in the
    parent process), event walks across a worker pool.

    pool="thread" fans the walks over threads instead of spawned
    processes: the hot native calls (conditioning, detect walk, decode
    FSMs) release the GIL for their ctypes duration, so threads scale on
    few-core hosts without paying interpreter boot + sample pickling (the
    native layer is thread-safe — per-thread scratch, the same property
    the stream farm relies on).

    frontend="fused" additionally computes every correlator channel and the
    detect-trigger indices on the device with the fused Pallas kernel
    (dsp.tpu_channels) and preloads them into each walk — the full TPU hot
    path feeding the host FSMs."""
    from ..dsp.conditioner import condition_jax
    from ..native import condition_exact

    if not paths:
        return {}
    power_thr = decoder_kwargs.get("power_level_threshold", 0.01)
    thresholds = decoder_kwargs.get("thresholds")

    if keep_pool and pool == "process" and frontend == "host" \
            and conditioner != "jax" and len(paths) > 1:
        # persistent path-only pool: workers read + condition + walk their
        # captures end to end, heaps stay warm across calls (see
        # persistent_pool above).  Long captures dispatch first so the
        # tail of the schedule stays balanced.
        if workers is None:
            workers = min(len(paths), os.cpu_count() or 1)
        if workers > 1:
            order = sorted(
                range(len(paths)),
                key=lambda i: -os.path.getsize(paths[i]),
            )
            ex = persistent_pool(workers)
            frames = list(ex.map(
                _walk_path,
                [(paths[i], decoder_kwargs) for i in order],
            ))
            return {paths[i]: f for i, f in zip(order, frames)}

    all_samples: list[np.ndarray] = []
    rates: list[int] = []
    for path in paths:
        samples, info = read_wav(path)
        all_samples.append(samples)
        rates.append(info.sample_rate)

    channel_sets: list = [None] * len(paths)
    cond_sets: list = [None] * len(paths)
    if frontend == "mask":
        # lightest device frontend: ONE dispatch + a 1-byte/sample mask
        # fetch replaces the host's trigger-index construction; the fetch
        # (network/PCIe-bound, GIL-free) overlaps with native conditioning
        # of every capture on a second thread
        from concurrent.futures import ThreadPoolExecutor as _TPE

        from ..dsp.tpu_channels import fused_batch_masks

        if len(set(rates)) > 1:
            raise ValueError(
                "fused batch decode requires a uniform sample rate; "
                f"got {sorted(set(rates))}"
            )
        with _TPE(1) as bg:
            fut = bg.submit(
                fused_batch_masks, all_samples, rates[0], power_thr,
                thresholds=thresholds,
            )
            for i, (samples, rate) in enumerate(zip(all_samples, rates)):
                params = SignalParams(
                    rate, power_level_threshold=power_thr
                )
                cond_sets[i] = condition_exact(samples, params)
            channel_sets = fut.result()
    elif frontend == "fused":
        # ALL captures in ONE device dispatch + one pipelined fetch
        # (dsp.tpu_channels._run_batch_blocks): the per-capture dispatch
        # path paid the ~30 ms tunnel round trips per capture and a
        # distinct-compile per block-count; batching amortizes both.
        # Captures must share one sample rate (the kernel is built for the
        # 10 MS/s reference rate — enforced downstream).
        if len(set(rates)) > 1:
            raise ValueError(
                "fused batch decode requires a uniform sample rate; "
                f"got {sorted(set(rates))}"
            )
        if conditioner == "device":
            # full device frontend: conditioning AND channels from the
            # fused kernel — best when the host sits on the accelerator's
            # PCIe (5 extra dense f32 fetches/capture)
            from ..dsp.tpu_channels import fused_batch_all

            for i, (cond, chans) in enumerate(fused_batch_all(
                all_samples, rates[0], power_thr, thresholds=thresholds,
            )):
                cond_sets[i] = cond
                channel_sets[i] = chans
        else:
            # channels + detect indices from the device; conditioning runs
            # natively IN the workers (cond=None), parallel across the pool
            # — 1/3 less device->host traffic than the full-device variant,
            # and the dominant host cost still fans out
            from ..dsp.tpu_channels import fused_batch_channels

            channel_sets = fused_batch_channels(
                all_samples, rates[0], power_thr, thresholds=thresholds,
            )

    jobs = []
    for samples, rate, cond, tpu_channels in zip(
        all_samples, rates, cond_sets, channel_sets
    ):
        params = SignalParams(rate, power_level_threshold=power_thr)
        cond_arrays = None
        if frontend == "host" and conditioner == "jax":
            # accelerator conditioning must run in the parent (workers
            # never touch the device); the mask frontend already
            # conditioned natively while the fetch was in flight
            cond = condition_jax(samples, params)
        # otherwise native conditioning runs IN the workers
        # (cond_arrays=None): it is the dominant host cost, so serializing
        # it in the parent would cap the pool's speedup
        if cond is not None:
            cond_arrays = (
                cond.value,
                cond.envelope,
                cond.filtered,
                cond.deviation,
                cond.average,
                cond.mod_depth,
                cond.edge_peak,
                cond.edge_time,
            )
        jobs.append(
            (samples, rate, cond_arrays, tpu_channels, decoder_kwargs)
        )

    fork_ok = _fork_ok()
    if workers is None:
        ncpu = os.cpu_count() or 1
        if pool == "thread" or fork_ok:
            workers = min(len(paths), ncpu)
        else:
            # spawn-pool overhead (interpreter boot + sample pickling)
            # costs more than it buys below ~4 cores — measured 9.7 MS/s
            # serial vs 2.7 MS/s with a 2-worker spawn pool on a 2-core
            # host; threads scale even there (GIL-free native walks)
            workers = 1 if ncpu <= 2 else min(len(paths), ncpu)
    results: dict[str, list[Frame]] = {}
    if workers <= 1 or len(paths) == 1:
        for path, job in zip(paths, jobs):
            results[path] = _walk_one(job)
        return results

    if pool == "thread":
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as tp:
            for path, frames in zip(paths, tp.map(_walk_one, jobs)):
                results[path] = frames
        return results

    if fork_ok:
        # fork workers inherit the job list as copy-on-write pages: no
        # interpreter boot (~2 s user-CPU each on slow-boot hosts), no
        # sample pickling.  Only taken while the parent is single-threaded
        # with jax never loaded (_fork_ok).
        global _FORK_JOBS
        _FORK_JOBS = jobs
        try:
            with ProcessPoolExecutor(
                max_workers=workers,
                mp_context=multiprocessing.get_context("fork"),
            ) as pp:
                for path, frames in zip(
                    paths, pp.map(_walk_fork, range(len(jobs)))
                ):
                    results[path] = frames
        finally:
            _FORK_JOBS = None
        return results

    # spawn, not fork: the parent holds live jax/XLA threads (device
    # frontend, parallel fetch pools) and forking a multithreaded process
    # risks deadlock in the children
    with ProcessPoolExecutor(
        max_workers=workers, mp_context=multiprocessing.get_context("spawn")
    ) as pp:
        for path, frames in zip(paths, pp.map(_walk_one, jobs)):
            results[path] = frames
    return results
