"""Kernel-v3 probe: chained streaming rate vs tile width (sub) and output
selection.

Knobs (env): BATCH (streams), SUB (8/16/32/64), K (chained chunks),
SELECT (all | mask | boxes), CHUNK.

Same methodology as bench.py: carried-state chunk chain, scalar-reduction
sync per dispatch (block_until_ready does not block through the axon
tunnel), distinct input buffers cycled so input reads are real.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

_CACHE = "/root/repo/.jax_cache"

SELECTS = {
    "all": None,
    "mask": ("detect_mask",),
    "boxes": ("bv12", "bv24", "bv47", "bv94", "q47", "q189",
              "p24x6", "p47x12", "p94x24", "detect_mask"),
}


def main():
    import jax

    os.makedirs(_CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from nfclab.core.params import SignalParams
    from nfclab.core.thresholds import DecoderThresholds
    from nfclab.dsp.frontend import _params_tuple
    from nfclab.dsp.pallas.fused_frontend import fused_frontend

    BATCH = int(os.environ.get("BATCH", "2048"))
    SUB = int(os.environ.get("SUB", "16"))
    K = int(os.environ.get("K", "48"))
    CHUNK = int(os.environ.get("CHUNK", "65536"))
    DISTINCT = 4
    sel_name = os.environ.get("SELECT", "all")
    select = SELECTS[sel_name]

    params = SignalParams(10_000_000)
    pt = _params_tuple(params)
    mp = DecoderThresholds().detect_mask_tuple(params.power_level_threshold)

    def chain_stream(*bufs):
        state = None
        total = jnp.float32(0.0)
        for i in range(K):
            res, state = fused_frontend(
                bufs[i % DISTINCT], pt, native_layout=True, mask_params=mp,
                state=state, base=i * CHUNK, return_state=True, sub=SUB,
                select=select,
            )
            total = total + sum(jnp.sum(v[:, -1]) for v in res.values())
        return total

    red = jax.jit(chain_stream)

    rng = np.random.default_rng(0)
    devs = [
        jax.device_put(
            (rng.random((BATCH, CHUNK), dtype=np.float32) * 0.4)
        )
        for _ in range(DISTINCT)
    ]

    t0 = time.perf_counter()
    float(red(*devs))
    print(f"warmup/compile: {time.perf_counter() - t0:.1f} s", flush=True)

    reps = 3
    best = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        float(red(*devs))
        best = min(best, time.perf_counter() - t0)

    rate = K * BATCH * CHUNK / best
    step_ns = best / (K * CHUNK) * 1e9
    print(
        f"BATCH={BATCH} SUB={SUB} K={K} SELECT={sel_name}: "
        f"{best*1e3:.1f} ms -> {rate/1e9:.2f} GS/s ({step_ns:.0f} ns/step)"
    )


if __name__ == "__main__":
    main()
