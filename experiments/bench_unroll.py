"""Bench variant: python-unrolled 16-chunk chain with STATIC input slices
(no per-chunk dynamic_index copy) vs the committed lax.scan bench."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    from nfclab.core.params import SignalParams
    from nfclab.dsp.frontend import _params_tuple
    from nfclab.dsp.pallas.fused_frontend import fused_frontend

    pt = _params_tuple(SignalParams(10_000_000))
    mp = (0.01, 0.75, 0.10, 0.50, 0.50)
    BATCH, CHUNK, K, DISTINCT = 2048, 65536, 32, 4
    rng = np.random.default_rng(0)
    xs = [
        jax.device_put((rng.random((BATCH, CHUNK), dtype=np.float32) * 0.4)
                       .astype(np.float32))
        for _ in range(DISTINCT)
    ]

    def red(*bufs):
        state = None
        total = jnp.float32(0.0)
        for i in range(K):
            res, state = fused_frontend(
                bufs[i % DISTINCT], pt, native_layout=True, mask_params=mp,
                state=state, base=i * CHUNK, return_state=True)
            total += sum(jnp.sum(v[:, -1]) for v in res.values())
        return total

    jred = jax.jit(red)
    float(jred(*xs))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        float(jred(*xs))
    dt = (time.perf_counter() - t0) / reps
    print(f"unrolled k={K}: {dt*1e3:.1f} ms -> {K*BATCH*CHUNK/dt/1e9:.3f} GS/s")

if __name__ == "__main__":
    main()
