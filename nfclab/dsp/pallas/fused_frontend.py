"""Fused Pallas frontend: conditioning + every correlator channel, one pass.

The hot decode path needs, per sample: the conditioning states and a family
of boxcar sums (raw-value boxes for the ASK correlators, squared-filtered
boxes for the listen channels, lagged-product boxes for the BPSK
integrators).  Computing these as separate XLA passes costs one HBM round
trip each; this kernel produces all of them in a single sweep:

- 1024 streams/instance as one (8, 128) tile per step (VPU-native);
- sequential time grid, carry + ring buffers resident in VMEM:
  value ring (128), filtered ring (128), squared ring (256), product rings
  (8/16/32) — sized for the largest window (189 for the NFC-V listen box);
- running box sums maintained incrementally exactly like the reference's
  own float32 integrators (NfcA.cpp:246-250 et al.), with identical
  roundoff family; zero-filled rings reproduce the reference's warm-up.

Outputs (17 x f32): env, filt, mdev, avg, mod_depth,
  bv12, bv24, bv47, bv94        raw-value boxes (A rates p2 + V p2)
  q47, q189                     squared-filtered boxes (A/V listen)
  p24x6, p47x12, p94x24         BPSK product boxes (A424/A212+B212/B106)
  mask_a_0/1/2                  NFC-A detect masks (0/1 f32): |SD| above the
                                correlation threshold at power-ok samples,
                                SD read from a VMEM ring of box values at
                                the rate's delay cascade (no XLA pass)

Layout: the kernel's native tiling is [g, t, 8, 128] (1024 streams per grid
row as an (8, 128) VPU tile per time step).  `native_layout=True` returns
that directly — the production path derives SD/masks in the same layout and
never pays the 14-output HBM transpose back to [B, T].

Window constants are for 10 MS/s capture rate (the reference's recommended
rate); other rates fall back to the unfused path.
"""

from __future__ import annotations

import functools

import numpy as np

LANES = 1024
TILE = 64
UNROLL = False  # +2.5% GS/s but ~25 min first compile; not worth cold-cache risk

# 10 MS/s window set
BV_WIDTHS = (12, 24, 47, 94)
Q_WIDTHS = (47, 189)
PB = ((24, 6), (47, 12), (94, 24))  # (lag, box)

RV_RING = 128
RF_RING = 128
RQ_RING = 256
RP_RINGS = (8, 16, 32)

# NFC-A detect per rate: (delay cascade d, gap = p1-p2, p2, index of p2 in
# BV_WIDTHS); max ring lookback = d + gap + 1 = 154 < RB_RING
A_RATES = ((0, 47, 47, 2), (94, 23, 24, 1), (141, 12, 12, 0))
RB_RING = 192

N_OUT = 5 + len(BV_WIDTHS) + len(Q_WIDTHS) + len(PB) + len(A_RATES)


def _fused_kernel(params, mask_params, value_ref, init_ref, out_refs, carry,
                  rv, rf, rq, rp0, rp1, rp2, rb, sums):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    (enve_w0, enve_w1, mdev_w0, mdev_w1, mean_w0, mean_w1, iir_a, etu) = params
    (power_thr, corr_thr) = mask_params

    t_idx = pl.program_id(1)
    rps = (rp0, rp1, rp2)

    @pl.when(t_idx == 0)
    def _():
        z = jnp.zeros((8, 128), jnp.float32)
        carry[0] = init_ref[0]  # env
        carry[1] = init_ref[1]  # w1
        carry[2] = init_ref[2]  # mdev
        carry[3] = init_ref[3]  # avg
        for k in range(rv.shape[0]):
            rv[k] = z
        for k in range(rf.shape[0]):
            rf[k] = z
        for k in range(rq.shape[0]):
            rq[k] = z
        for rp in rps:
            for k in range(rp.shape[0]):
                rp[k] = z
        for k in range(rb.shape[0]):
            rb[k] = z
        for k in range(sums.shape[0]):
            sums[k] = z

    def body(j, _):
        t = t_idx * TILE + j
        v = value_ref[j]
        env = carry[0]
        w1 = carry[1]
        mdev = carry[2]
        avg = carry[3]

        # conditioning (NfcTech.cpp:39-68); envelope silence timeout handled
        # by the pulse counter packed into the sign-free integer range of f32
        diff = jnp.abs(v - env) / env
        # the silence counter is carried as integer-valued f32 (exact up to
        # 2^24, and it resets on every update)
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

        out_refs[0][j] = new_env
        out_refs[1][j] = filt
        out_refs[2][j] = mdev
        out_refs[3][j] = avg
        # modulation depth (NfcTech.cpp:71-74), fused to save an XLA pass
        clamped = jnp.maximum(0.0, jnp.minimum(v, new_env))
        out_refs[4][j] = (new_env - clamped) / new_env

        # raw-value boxes
        o = 5
        s = 0
        slot_v = jax.lax.rem(t, RV_RING)
        for w in BV_WIDTHS:
            old = rv[jax.lax.rem(t - w + RV_RING, RV_RING)]
            sums[s] = sums[s] + v - old
            out_refs[o][j] = sums[s]
            o += 1
            s += 1
        rv[slot_v] = v

        # squared-filtered boxes
        q = filt * filt * 10.0
        slot_q = jax.lax.rem(t, RQ_RING)
        for w in Q_WIDTHS:
            old = rq[jax.lax.rem(t - w + RQ_RING, RQ_RING)]
            sums[s] = sums[s] + q - old
            out_refs[o][j] = sums[s]
            o += 1
            s += 1
        rq[slot_q] = q

        # BPSK product boxes: prod = filt[t] * filt[t-lag] * 10
        slot_f = jax.lax.rem(t, RF_RING)
        for (lag, box), rp, rsize in zip(PB, rps, RP_RINGS):
            lagged = rf[jax.lax.rem(t - lag + RF_RING, RF_RING)]
            prod = filt * lagged * 10.0
            slot_p = jax.lax.rem(t, rsize)
            old = rp[jax.lax.rem(t - box + rsize, rsize)]
            sums[s] = sums[s] + prod - old
            out_refs[o][j] = sums[s]
            rp[slot_p] = prod
            o += 1
            s += 1
        rf[slot_f] = filt

        # NFC-A detect masks from box-value rings (frontend.py SD formula):
        # sd(t) = ((B(t-d) - B(t-d-gap)) - (B(t-d-gap) - B(t-d-1))) / p2
        slot_b = jax.lax.rem(t, RB_RING)
        power_ok = new_env >= power_thr
        min_corr = corr_thr * new_env
        for r, (d, gap, p2, widx) in enumerate(A_RATES):
            base = r * RB_RING
            # store first: rate 0 has d == 0 and reads the current box value
            rb[base + slot_b] = sums[widx]
            b0 = rb[base + jax.lax.rem(t - d + RB_RING, RB_RING)]
            bg = rb[base + jax.lax.rem(t - d - gap + 2 * RB_RING, RB_RING)]
            b1 = rb[base + jax.lax.rem(t - d - 1 + RB_RING, RB_RING)]
            sd = ((b0 - bg) - (bg - b1)) / jnp.float32(p2)
            mask = power_ok & (jnp.abs(sd) > min_corr)
            out_refs[o][j] = mask.astype(jnp.float32)
            o += 1
        return 0

    if UNROLL:
        for j in range(TILE):
            body(j, 0)
    else:
        jax.lax.fori_loop(0, TILE, body, 0)


class _View:
    """Ref view dropping a leading singleton dim."""

    def __init__(self, ref):
        self.ref = ref

    def __getitem__(self, j):
        return self.ref[0, j]

    def __setitem__(self, j, value):
        self.ref[0, j] = value

    @property
    def shape(self):
        return self.ref.shape[1:]


@functools.lru_cache(maxsize=4)
def _jitted(params, mask_params, g: int, t: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_t = t // TILE
    n_sums = len(BV_WIDTHS) + len(Q_WIDTHS) + len(PB)

    tile_spec = pl.BlockSpec(
        (1, TILE, 8, 128), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
    )
    init_spec = pl.BlockSpec(
        (1, 5, 8, 128), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )

    def kernel(value_ref, init_ref, *rest):
        out_refs = [
            _View(r) for r in rest[:N_OUT]
        ]
        carry, rv, rf, rq, rp0, rp1, rp2, rb, sums = rest[N_OUT:]
        _fused_kernel(
            params, mask_params, _View(value_ref), _View(init_ref), out_refs,
            carry, rv, rf, rq, rp0, rp1, rp2, rb, sums,
        )

    out_shape = [jax.ShapeDtypeStruct((g, t, 8, 128), jnp.float32)] * N_OUT

    def run(value, init):
        return pl.pallas_call(
            kernel,
            grid=(g, n_t),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            in_specs=[tile_spec, init_spec],
            out_specs=[tile_spec] * N_OUT,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((5, 8, 128), jnp.float32),  # carry
                pltpu.VMEM((RV_RING, 8, 128), jnp.float32),
                pltpu.VMEM((RF_RING, 8, 128), jnp.float32),
                pltpu.VMEM((RQ_RING, 8, 128), jnp.float32),
                pltpu.VMEM((RP_RINGS[0], 8, 128), jnp.float32),
                pltpu.VMEM((RP_RINGS[1], 8, 128), jnp.float32),
                pltpu.VMEM((RP_RINGS[2], 8, 128), jnp.float32),
                pltpu.VMEM((len(A_RATES) * RB_RING, 8, 128), jnp.float32),
                pltpu.VMEM((n_sums, 8, 128), jnp.float32),
            ],
        )(value, init)

    return jax.jit(run)


OUTPUT_NAMES = (
    ["envelope", "filtered", "deviation", "average", "mod_depth"]
    + [f"bv{w}" for w in BV_WIDTHS]
    + [f"q{w}" for w in Q_WIDTHS]
    + [f"p{lag}x{box}" for lag, box in PB]
    + [f"mask_a_{r}" for r in range(len(A_RATES))]
)


def fused_frontend(value, params, native_layout=False,
                   mask_params=(0.01, 0.75)):
    """value: [B, T], B % 1024 == 0, T % TILE == 0.

    native_layout=False: dict of [B, T] f32 (pays one transpose per output).
    native_layout=True:  dict of [g, t, 8, 128] f32 (kernel-native tiling;
    stream b lives at [b // 1024, :, (b % 1024) // 128, b % 128]).
    mask_params: (power_level_threshold, nfca_correlation_threshold)."""
    import jax.numpy as jnp

    b, t = value.shape
    assert b % LANES == 0 and t % TILE == 0
    g = b // LANES
    vt = jnp.asarray(value, jnp.float32).reshape(g, 8, 128, t).transpose(0, 3, 1, 2)
    init = jnp.zeros((g, 5, 8, 128), jnp.float32)
    mp = (np.float32(mask_params[0]), np.float32(mask_params[1]))
    outs = _jitted(params, mp, g, t)(vt, init)
    res = {}
    for name, o in zip(OUTPUT_NAMES, outs):
        res[name] = o if native_layout else o.transpose(0, 2, 3, 1).reshape(b, t)
    return res
