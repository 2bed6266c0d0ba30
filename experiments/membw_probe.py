"""Measure this chip's achievable HBM streaming bandwidth (read+write) to
anchor the kernel's speed-of-light claim: a chained elementwise pass over
large f32 buffers, synchronized by a scalar reduction fetch (bench.py
methodology)."""
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = 8192, 8192  # 256 MB per buffer
    K = 24
    TR = 32

    NOUT = int(os.environ.get("NOUT", "14"))  # concurrent DMA write streams
    def copy_kernel(x_ref, *o_refs):
        v = x_ref[...]
        for i, o in enumerate(o_refs):
            o[...] = v * np.float32(1.0 + 1e-7 * i)

    # one call, grid (K, R/TR): K full sweeps over the buffer inside a
    # single kernel launch (per-call dispatch overhead ~1 ms otherwise
    # dominates and the probe reads launch latency, not bandwidth)
    spec = pl.BlockSpec((TR, C), lambda k, i: (i, 0),
                        memory_space=pltpu.VMEM)

    def chain(a):
        outs = pl.pallas_call(
            copy_kernel, grid=(K, R // TR), in_specs=[spec],
            out_specs=[spec] * NOUT,
            out_shape=[jax.ShapeDtypeStruct((R, C), jnp.float32)] * NOUT,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(a)
        return sum(x[-1, -1] for x in outs)

    N = R * C
    f = jax.jit(chain)
    rng = np.random.default_rng(0)
    a = jax.device_put(rng.random((R, C), dtype=np.float32))
    float(f(a))
    best = 1e18
    for _ in range(4):
        t0 = time.perf_counter()
        float(f(a))
        best = min(best, time.perf_counter() - t0)
    # per sweep: read N + write NOUT x N floats
    traffic = K * N * 4 * (1 + NOUT)  # bytes (read + writes)
    print(f"achievable HBM streaming bandwidth: {traffic/best/1e9:.0f} GB/s "
          f"({best*1e3:.1f} ms for {traffic/1e9:.1f} GB)")


if __name__ == "__main__":
    main()
