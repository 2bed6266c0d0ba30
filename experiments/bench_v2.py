"""Measure the v2 fused kernel (shrunk rings, carried b1, sub up to 32)
against the production kernel, both in chained carried-state mode."""
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

    pt = _params_tuple(SignalParams(10_000_000))
    mp = (0.01, 0.75, 0.10, 0.50, 0.50)
    rng = np.random.default_rng(0)
    reps = 5

    import importlib
    which = sys.argv[1] if len(sys.argv) > 1 else "v2"
    if which == "v2":
        mod = importlib.import_module("experiments.fused_v2")
    else:
        mod = importlib.import_module("nfclab.dsp.pallas.fused_frontend")

    for batch, k, chunk in ([(4096, 16, 16384), (4096, 8, 32768)]
                            if which == "v2" else [(2048, 16, 65536)]):
        x1 = (rng.random((batch, chunk), dtype=np.float32) * 0.4).astype(np.float32)
        dev1 = jax.device_put(x1)

        def red(x):
            state = None
            total = jnp.float32(0.0)
            for i in range(k):
                res, state = mod.fused_frontend(
                    x, pt, native_layout=True, mask_params=mp,
                    state=state, base=i * chunk, return_state=True)
                total += sum(jnp.sum(v[:, -1]) for v in res.values())
            return total

        jred = jax.jit(red)
        try:
            float(jred(dev1))
        except Exception as e:
            print(f"{which} batch={batch}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        t0 = time.perf_counter()
        for _ in range(reps):
            float(jred(dev1))
        dt = (time.perf_counter() - t0) / reps
        print(f"{which} batch={batch} k={k}: {dt*1e3:.1f} ms -> {k*batch*chunk/dt/1e9:.3f} GS/s")

if __name__ == "__main__":
    main()
