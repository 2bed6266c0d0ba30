"""Experiment: amortize the axon dispatch floor by chaining carried-state
frontend chunks inside one jit dispatch (the production streaming mode).

Compares:
  A. current bench: one 2048x(64k+16k halo) overlap-save call per dispatch
  B. k state-carried 2048x64k chunks per dispatch (no halo waste)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")


def main():
    import jax

    os.makedirs(_CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from nfclab.core.params import SignalParams
    from nfclab.dsp.frontend import _params_tuple, make_fused_frontend
    from nfclab.dsp.pallas.fused_frontend import fused_frontend

    params = SignalParams(10_000_000)
    pt = _params_tuple(params)
    mp = (0.01, 0.75, 0.10, 0.50, 0.50)

    rng = np.random.default_rng(0)

    # ---- A: current bench shape
    frontend = make_fused_frontend(params)
    redA = jax.jit(
        lambda x: sum(jnp.sum(v[:, -1]) for v in frontend(x).values())
    )
    batch, span = 2048, 65536 + 16384
    blocks = (rng.random((batch, span), dtype=np.float32) * 0.4).astype(np.float32)
    devA = jax.device_put(blocks)
    float(redA(devA))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        float(redA(devA))
    dtA = (time.perf_counter() - t0) / reps
    rateA = batch * 65536 / dtA
    print(f"A overlap-save 1 call/dispatch: {dtA*1e3:.1f} ms -> {rateA/1e9:.3f} GS/s")

    # ---- B: k chained chunks, carried state, one dispatch
    for k, chunk in ((2, 65536), (4, 65536), (6, 65536), (12, 32768)):

        def redB(x):  # x: [k, B, chunk]
            state = None
            total = jnp.float32(0.0)
            for i in range(x.shape[0]):
                res, state = fused_frontend(
                    x[i], pt, native_layout=True, mask_params=mp,
                    state=state, base=i * chunk, return_state=True,
                )
                total += sum(jnp.sum(v[:, -1]) for v in res.values())
            return total

        jredB = jax.jit(redB)
        xb = (rng.random((k, batch, chunk), dtype=np.float32) * 0.4).astype(
            np.float32
        )
        devB = jax.device_put(xb)
        float(jredB(devB))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(jredB(devB))
        dtB = (time.perf_counter() - t0) / reps
        rateB = k * batch * chunk / dtB
        print(f"B chained k={k} chunk={chunk}: {dtB*1e3:.1f} ms -> {rateB/1e9:.3f} GS/s")
        del devB

    # ---- C: fixed 512MB input fed k times (kernel-rate asymptote)
    x1 = (rng.random((batch, 65536), dtype=np.float32) * 0.4).astype(np.float32)
    dev1 = jax.device_put(x1)
    for k in (8, 16):

        def redC(x):
            state = None
            total = jnp.float32(0.0)
            for i in range(k):
                res, state = fused_frontend(
                    x, pt, native_layout=True, mask_params=mp,
                    state=state, base=i * 65536, return_state=True,
                )
                total += sum(jnp.sum(v[:, -1]) for v in res.values())
            return total

        jredC = jax.jit(redC)
        float(jredC(dev1))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(jredC(dev1))
        dtC = (time.perf_counter() - t0) / reps
        rateC = k * batch * 65536 / dtC
        print(f"C fixed-input k={k}: {dtC*1e3:.1f} ms -> {rateC/1e9:.3f} GS/s")


if __name__ == "__main__":
    main()
