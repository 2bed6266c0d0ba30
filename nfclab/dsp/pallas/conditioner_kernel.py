"""Pallas TPU kernel for the conditioning scan.

The conditioning chain (NfcTech.cpp:28-105) is a 1-sample recurrence; under
`lax.scan` the XLA while-loop costs microseconds per step (dynamic-update
slices of the stacked outputs dominate), capping throughput at ~0.1 GS/s.
This kernel restructures it TPU-natively:

- lanes: 1024 independent streams per kernel instance, laid out as one
  native (8, 128) VPU tile per time step — every scalar op in the reference
  inner loop becomes a full-width vector op;
- time: a sequential Pallas grid over time tiles with the carry held in VMEM
  scratch (TPU grid steps execute in order on a core), with Mosaic
  double-buffering the HBM<->VMEM tile DMA;
- the loop body is the *same float op order* as the reference / the C++
  oracle, so bit-exactness is preserved.

Input layout: value[G, T, 8, 128] (G batch groups of 1024 streams); outputs
are six arrays of the same shape (envelope, w1, mdev, avg, filtered, pulse).
"""

from __future__ import annotations

import functools

import numpy as np

LANES = 1024  # streams per kernel instance: one (8, 128) tile
TILE = 256  # time samples per grid step


def _kernel(params, value_ref, env0_ref, w10_ref, mdev0_ref, avg0_ref,
            pulse0_ref, clock0_ref,
            env_ref, w1_ref, mdev_ref, avg_ref, filt_ref, pulse_ref,
            carry):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    (enve_w0, enve_w1, mdev_w0, mdev_w1, mean_w0, mean_w1, iir_a, etu) = params

    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        carry[0] = env0_ref[...]
        carry[1] = w10_ref[...]
        carry[2] = mdev0_ref[...]
        carry[3] = avg0_ref[...]
        carry[4] = pltpu_bitcast_f32(pulse0_ref[...])
        carry[5] = pltpu_bitcast_f32(clock0_ref[...])

    def body(j, _):
        v = value_ref[j]
        env = carry[0]
        w1 = carry[1]
        mdev = carry[2]
        avg = carry[3]
        pulse = pltpu_bitcast_i32(carry[4])
        clock = pltpu_bitcast_i32(carry[5])

        # conditional envelope (NfcTech.cpp:39-53)
        pulse = pulse + 1
        diff = jnp.abs(v - env) / env
        update = (diff < 0.05) | (pulse > etu * 10)
        seed = (~update) & (clock < etu)
        new_env = jnp.where(
            update, env * enve_w0 + v * enve_w1, jnp.where(seed, v, env)
        )
        pulse = jnp.where(update, 0, pulse)

        # IIR DC removal (NfcTech.cpp:56-62)
        w0 = v + w1 * iir_a
        filt = w0 - w1
        w1 = w0

        # EMAs (NfcTech.cpp:65-68)
        mdev = mdev * mdev_w0 + jnp.abs(filt) * mdev_w1
        avg = avg * mean_w0 + v * mean_w1

        clock = clock + 1

        carry[0] = new_env
        carry[1] = w1
        carry[2] = mdev
        carry[3] = avg
        carry[4] = pltpu_bitcast_f32(pulse)
        carry[5] = pltpu_bitcast_f32(clock)

        env_ref[j] = new_env
        w1_ref[j] = w1
        mdev_ref[j] = mdev
        avg_ref[j] = avg
        filt_ref[j] = filt
        pulse_ref[j] = pulse
        return 0

    jax.lax.fori_loop(0, TILE, body, 0)


def pltpu_bitcast_f32(x):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.bitcast(x, np.float32)


def pltpu_bitcast_i32(x):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.bitcast(x, np.int32)


@functools.lru_cache(maxsize=8)
def _jitted_kernel(params, g: int, t: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_t = t // TILE

    tile_spec = pl.BlockSpec(
        (1, TILE, 8, 128),
        lambda b, i: (b, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    init_spec = pl.BlockSpec(
        (1, 8, 128), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )

    def squeeze_kernel(*refs):
        # drop the leading singleton batch-group dim from every ref view
        params_refs = refs[:-1]
        carry = refs[-1]
        _kernel(
            params,
            *[_SqueezeRef(r) for r in params_refs],
            carry,
        )

    class _SqueezeRef:
        """View of a (1, ...) block ref without the leading singleton."""

        def __init__(self, ref):
            self.ref = ref

        def __getitem__(self, j):
            if j is Ellipsis:
                return self.ref[0]
            return self.ref[0, j]

        def __setitem__(self, j, value):
            if j is Ellipsis:
                self.ref[0] = value
            else:
                self.ref[0, j] = value

    out_shape = [
        jax.ShapeDtypeStruct((g, t, 8, 128), jnp.float32) for _ in range(5)
    ] + [jax.ShapeDtypeStruct((g, t, 8, 128), jnp.int32)]

    def run(value, env0, w10, mdev0, avg0, pulse0, clock0):
        return pl.pallas_call(
            squeeze_kernel,
            grid=(g, n_t),
            in_specs=[tile_spec] + [init_spec] * 6,
            out_specs=[tile_spec] * 6,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((6, 8, 128), jnp.float32)],
        )(value, env0, w10, mdev0, avg0, pulse0, clock0)

    return jax.jit(run)


def condition_scan_pallas(value, env0, w10, mdev0, avg0, pulse0, clock0, params):
    """value: [B, T] with B % 1024 == 0 and T % TILE == 0; init states [B].

    Returns (env, w1, mdev, avg, filt, pulse) as [B, T] arrays — the same
    contract as dsp.conditioner._build_scan but at VPU-native throughput.
    """
    import jax.numpy as jnp

    b, t = value.shape
    assert b % LANES == 0, f"batch {b} must be a multiple of {LANES}"
    assert t % TILE == 0, f"span {t} must be a multiple of {TILE}"
    g = b // LANES

    def to_tiles(x, dtype):
        # [B, T] -> [G, T, 8, 128]
        return (
            jnp.asarray(x, dtype)
            .reshape(g, 8, 128, t)
            .transpose(0, 3, 1, 2)
        )

    def init_tiles(x, dtype):
        return jnp.asarray(x, dtype).reshape(g, 8, 128)

    fn = _jitted_kernel(params, g, t)
    outs = fn(
        to_tiles(value, jnp.float32),
        init_tiles(env0, jnp.float32),
        init_tiles(w10, jnp.float32),
        init_tiles(mdev0, jnp.float32),
        init_tiles(avg0, jnp.float32),
        init_tiles(pulse0, jnp.int32),
        init_tiles(clock0, jnp.int32),
    )

    def from_tiles(x):
        # [G, T, 8, 128] -> [B, T]
        return x.transpose(0, 2, 3, 1).reshape(b, t)

    return tuple(from_tiles(o) for o in outs)
