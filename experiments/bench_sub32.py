"""Validate + time the DMA-state fused kernel (sub=32) vs the VMEM-state
kernel (sub=16).  Equality is checked in [B, T] layout (bitwise)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

_CACHE_DIR = "/root/repo/.jax_cache"


def main():
    import jax

    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from nfclab.core.params import SignalParams
    from nfclab.dsp.frontend import _params_tuple
    from nfclab.dsp.pallas.fused_frontend import fused_frontend

    params = SignalParams(10_000_000)
    pt = _params_tuple(params)
    mp = (float(params.power_level_threshold), 0.75, 0.10, 0.50, 0.50)

    rng = np.random.default_rng(0)
    B, T = 4096, 4096
    x = (rng.random((B, T), dtype=np.float32) * 0.4).astype(np.float32)

    if os.environ.get("SKIP_EQ"):
        run_timing(jax, jnp, fused_frontend, pt, mp, rng)
        return
    print("== equality check (B=4096, T=4096) ==", flush=True)
    r16 = fused_frontend(x, pt, mask_params=mp, sub=16)
    r32 = fused_frontend(x, pt, mask_params=mp, sub=32)
    for k in r16:
        a, b = np.asarray(r16[k]), np.asarray(r32[k])
        same = np.array_equal(a, b)
        print(f"  {k}: {'OK' if same else 'MISMATCH'}", flush=True)
        if not same:
            bad = np.argwhere(a != b)
            print("   first mismatch", bad[:3], a.flat[0], b.flat[0])
            return

    # streaming equality: 2 chunks with carried state == monolithic
    print("== chunked state carry (sub=32) ==", flush=True)
    r_a, st = fused_frontend(
        x[:, : T // 2], pt, mask_params=mp, sub=32, state=None, base=0,
        return_state=True,
    )
    r_b, _ = fused_frontend(
        x[:, T // 2 :], pt, mask_params=mp, sub=32, state=st, base=T // 2,
        return_state=True,
    )
    for k in r16:
        whole = np.asarray(r16[k])
        parts = np.concatenate([np.asarray(r_a[k]), np.asarray(r_b[k])], axis=1)
        print(f"  {k}: {'OK' if np.array_equal(whole, parts) else 'MISMATCH'}",
              flush=True)

    if os.environ.get("SKIP_TIMING"):
        return
    run_timing(jax, jnp, fused_frontend, pt, mp, rng)


def run_timing(jax, jnp, fused_frontend, pt, mp, rng):
    # timing: carried-chunk chain like bench.py
    print("== timing ==", flush=True)
    K = int(os.environ.get("BK", 16))
    BATCH, CHUNK, DISTINCT = 4096, 32768, 4

    def chain(sub):
        def f(*bufs):
            state = None
            total = jnp.float32(0.0)
            for i in range(K):
                res, state = fused_frontend(
                    bufs[i % DISTINCT], pt, native_layout=True,
                    mask_params=mp, state=state, base=i * CHUNK,
                    return_state=True, sub=sub,
                )
                total = total + sum(jnp.sum(v[:, -1]) for v in res.values())
            return total
        return jax.jit(f)

    devs = [
        jax.device_put(
            (rng.random((BATCH, CHUNK), dtype=np.float32) * 0.4).astype(
                np.float32
            )
        )
        for _ in range(DISTINCT)
    ]
    for sub in (16, 32):
        fn = chain(sub)
        float(fn(*devs))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            float(fn(*devs))
        dt = (time.perf_counter() - t0) / reps
        rate = K * BATCH * CHUNK / dt
        print(f"  sub={sub}: {rate/1e9:.2f} GS/s", flush=True)


if __name__ == "__main__":
    main()
