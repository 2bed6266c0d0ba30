"""Measure fused-kernel rate vs time-tile size (TILE) and state variant.

TILE is the per-grid-step time block; bigger tiles amortize per-step
overhead (DMA sync, grid bookkeeping) at the cost of VMEM for the output
double buffers.  Monkeypatches fused_frontend.TILE before first build.
Env: TILE (default 64), DMA (1 -> force _jitted_dma), BK chunks."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

_CACHE = "/root/repo/.jax_cache"


def main():
    import jax

    os.makedirs(_CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import nfclab.dsp.pallas.fused_frontend as ff

    tile = int(os.environ.get("TILE", "64"))
    ff.TILE = tile
    if os.environ.get("DMA"):
        ff._jitted = ff._jitted_dma  # force the HBM-state variant

    from nfclab.core.params import SignalParams
    from nfclab.dsp.frontend import _params_tuple

    params = SignalParams(10_000_000)
    pt = _params_tuple(params)
    mp = (float(params.power_level_threshold), 0.75, 0.10, 0.50, 0.50)

    BATCH, CHUNK, DISTINCT = 2048, 65536, 4
    K = int(os.environ.get("BK", "16"))

    def chain(*bufs):
        state = None
        total = jnp.float32(0.0)
        for i in range(K):
            res, state = ff.fused_frontend(
                bufs[i % DISTINCT], pt, native_layout=True, mask_params=mp,
                state=state, base=i * CHUNK, return_state=True, sub=16,
            )
            total = total + sum(jnp.sum(v[:, -1]) for v in res.values())
        return total

    fn = jax.jit(chain)
    rng = np.random.default_rng(0)
    devs = [
        jax.device_put(
            (rng.random((BATCH, CHUNK), dtype=np.float32) * 0.4).astype(
                np.float32
            )
        )
        for _ in range(DISTINCT)
    ]
    float(fn(*devs))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*devs))
    dt = (time.perf_counter() - t0) / reps
    rate = K * BATCH * CHUNK / dt
    print(
        f"TILE={tile} dma={bool(os.environ.get('DMA'))} K={K}: "
        f"{rate/1e9:.2f} GS/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
