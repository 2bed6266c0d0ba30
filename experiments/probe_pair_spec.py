"""Probe: pairwise-speculative conditioning vs the serial baseline.

The conditioning chain's critical path per sample is the envelope update:
    diff = |v - env|/env   (DIV latency)
    update = (diff < 0.05) | (pcount > etu*10)
    env'   = select(update, env*w0 + v*w1, select(seed, v, env))
Processing TWO samples per iteration and precomputing sample t+1's division
for ALL candidate values of env_t (update/seed/hold) lets the three
speculative divs run concurrently with sample t's div; the resolved select
then picks the bit-identical quotient.  Same f32 ops -> bit-exact, but the
critical path per pair is ~one div + short ops instead of two full rounds.
"""
import functools
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

    from nfclab.core.params import SignalParams
    from nfclab.dsp.frontend import _params_tuple

    TILE = 128
    sub = 16
    MODE = os.environ.get("MODE", "pair")  # pair | serial

    pt = _params_tuple(SignalParams(10_000_000))

    def kernel(value_ref, env_ref, filt_ref, mdev_ref, avg_ref, mdepth_ref,
               carry):
        (enve_w0, enve_w1, mdev_w0, mdev_w1, mean_w0, mean_w1, iir_a,
         etu) = pt
        etu10 = etu * 10.0
        t_idx = pl.program_id(1)

        @pl.when(t_idx == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        def serial_body(j, _):
            t = t_idx * TILE + j
            v = value_ref[0, j]
            env = carry[0]
            w1 = carry[1]
            mdev = carry[2]
            avg = carry[3]
            diff = jnp.abs(v - env) / env
            pcount = carry[4] + 1.0
            update = (diff < 0.05) | (pcount > etu10)
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

        def pair_body(i, _):
            j = i * 2
            t = t_idx * TILE + j
            v1 = value_ref[0, j]
            v2 = value_ref[0, j + 1]
            env = carry[0]
            w1 = carry[1]
            mdev = carry[2]
            avg = carry[3]
            pcount = carry[4]

            # --- env chain, speculative pair ---
            c_u = env * enve_w0 + v1 * enve_w1
            d1 = jnp.abs(v1 - env) / env
            e_u = jnp.abs(v2 - c_u) / c_u
            e_s = jnp.abs(v2 - v1) / v1
            e_h = jnp.abs(v2 - env) / env
            p1 = pcount + 1.0
            u1 = (d1 < 0.05) | (p1 > etu10)
            s1 = (~u1) & (t < etu)
            env1 = jnp.where(u1, c_u, jnp.where(s1, v1, env))
            pc1 = jnp.where(u1, 0.0, p1)
            d2 = jnp.where(u1, e_u, jnp.where(s1, e_s, e_h))
            p2 = pc1 + 1.0
            u2 = (d2 < 0.05) | (p2 > etu10)
            s2 = (~u2) & (t + 1 < etu)
            c2u = env1 * enve_w0 + v2 * enve_w1
            env2 = jnp.where(u2, c2u, jnp.where(s2, v2, env1))
            pc2 = jnp.where(u2, 0.0, p2)

            # --- linear chains, plain 2x unroll (short latency) ---
            w0a = v1 + w1 * iir_a
            filt1 = w0a - w1
            w0b = v2 + w0a * iir_a
            filt2 = w0b - w0a
            mdev1 = mdev * mdev_w0 + jnp.abs(filt1) * mdev_w1
            mdev2 = mdev1 * mdev_w0 + jnp.abs(filt2) * mdev_w1
            avg1 = avg * mean_w0 + v1 * mean_w1
            avg2 = avg1 * mean_w0 + v2 * mean_w1

            carry[0] = env2
            carry[1] = w0b
            carry[2] = mdev2
            carry[3] = avg2
            carry[4] = pc2

            env_ref[0, j] = env1
            env_ref[0, j + 1] = env2
            filt_ref[0, j] = filt1
            filt_ref[0, j + 1] = filt2
            mdev_ref[0, j] = mdev1
            mdev_ref[0, j + 1] = mdev2
            avg_ref[0, j] = avg1
            avg_ref[0, j + 1] = avg2
            cl1 = jnp.maximum(0.0, jnp.minimum(v1, env1))
            mdepth_ref[0, j] = (env1 - cl1) / env1
            cl2 = jnp.maximum(0.0, jnp.minimum(v2, env2))
            mdepth_ref[0, j + 1] = (env2 - cl2) / env2
            return 0

        if MODE == "pair":
            jax.lax.fori_loop(0, TILE // 2, pair_body, 0)
        else:
            jax.lax.fori_loop(0, TILE, serial_body, 0)

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

    g, t = int(os.environ.get("G", "8")), 65536
    K = int(os.environ.get("K", "8"))
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
            v = outs[0]
        return total

    f = jax.jit(chain)
    float(f(x))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    n_samples = K * g * t * sub * 128
    print(f"{MODE}: {n_samples/best/1e9:.2f} GS/s "
          f"({best/(K*g*t)*1e9:.0f} ns/step-of-{TILE}, g={g})")


if __name__ == "__main__":
    main()
