"""Probe: serial-loop latency floor of a conditioning-only Pallas kernel.

The fused kernel's serial loop does conditioning + 9 ring-buffer box sums
(dynamic-index VMEM reads/writes).  If a conditioning-only loop runs much
faster, moving the box sums to a vectorized per-tile phase (segmented
window sums from linear histories) is worth the surgery.
"""
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
    import functools

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nfclab.core.params import SignalParams
    from nfclab.dsp.frontend import _params_tuple

    TILE = 128
    sub = 16
    UNROLL = bool(int(os.environ.get("UNROLL", "0")))

    pt = _params_tuple(SignalParams(10_000_000))

    def kernel(value_ref, env_ref, filt_ref, mdev_ref, avg_ref, mdepth_ref,
               carry):
        (enve_w0, enve_w1, mdev_w0, mdev_w1, mean_w0, mean_w1, iir_a,
         etu) = pt
        t_idx = pl.program_id(1)

        @pl.when(t_idx == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        def body(j, _):
            t = t_idx * TILE + j
            v = value_ref[0, j]
            env = carry[0]
            w1 = carry[1]
            mdev = carry[2]
            avg = carry[3]
            diff = jnp.abs(v - env) / env
            pcount = carry[4] + 1.0
            update = (diff < 0.05) | (pcount > etu * 10.0)
            seed = (~update) & (t < etu)
            new_env = jnp.where(update, env * enve_w0 + v * enve_w1,
                                jnp.where(seed, v, env))
            pcount = jnp.where(update, 0.0, pcount)
            w0 = v + w1 * iir_a
            filt = w0 - w1
            w1 = w0
            mdev = mdev * mdev_w0 + jnp.abs(filt) * mdev_w1
            avg = avg * mean_w0 + v * mean_w1
            carry[0] = new_env
            carry[1] = w1
            carry[2] = mdev
            carry[3] = avg
            carry[4] = pcount
            env_ref[0, j] = new_env
            filt_ref[0, j] = filt
            mdev_ref[0, j] = mdev
            avg_ref[0, j] = avg
            clamped = jnp.maximum(0.0, jnp.minimum(v, new_env))
            mdepth_ref[0, j] = (new_env - clamped) / new_env
            return 0

        if UNROLL:
            for j in range(TILE):
                body(j, 0)
        else:
            jax.lax.fori_loop(0, TILE, body, 0)

    @functools.lru_cache(maxsize=2)
    def build(g, t):
        n_t = t // TILE
        tile_spec = pl.BlockSpec(
            (1, TILE, sub, 128), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        )

        def run(value):
            return pl.pallas_call(
                kernel,
                grid=(g, n_t),
                in_specs=[tile_spec],
                out_specs=[tile_spec] * 5,
                out_shape=[
                    jax.ShapeDtypeStruct((g, t, sub, 128), jnp.float32)
                ] * 5,
                scratch_shapes=[pltpu.VMEM((8, sub, 128), jnp.float32)],
            )(value)

        return jax.jit(run)

    g, t = int(os.environ.get("G", "1")), 65536
    K = int(os.environ.get("K", "8"))  # chained calls per dispatch
    rng = np.random.default_rng(0)
    x = jax.device_put(
        (rng.random((g, t, sub, 128), dtype=np.float32) * 0.4)
    )
    base = build(g, t)

    def chain(v):
        total = jnp.float32(0.0)
        for _ in range(K):
            outs = base(v)
            total = total + jnp.sum(outs[0][:, -1])
            v = outs[0]  # feed forward so calls cannot be elided
        return total

    f = jax.jit(chain)
    float(f(x))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        s_ = float(f(x))
        best = min(best, time.perf_counter() - t0)
    n_samples = K * g * t * sub * 128
    print(f"conditioning-only serial loop: {n_samples/best/1e9:.2f} GS/s "
          f"({best/(K*g*t)*1e9:.0f} ns/step, g={g} groups x {sub*128} lanes)")


if __name__ == "__main__":
    main()
