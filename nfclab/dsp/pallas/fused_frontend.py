"""Fused Pallas frontend: conditioning + every correlator channel, one pass.

The hot decode path needs, per sample: the conditioning states and a family
of boxcar sums (raw-value boxes for the ASK correlators, squared-filtered
boxes for the listen channels, lagged-product boxes for the BPSK
integrators).  Computing these as separate XLA passes costs one HBM round
trip each; this kernel produces all of them in a single sweep:

- 1024 streams/instance as one (8, 128) tile per step (VPU-native);
- the serial per-sample loop is partially unrolled (UNROLL_FACTOR bodies
  per fori_loop iteration) — cuts the loop's scalar bookkeeping ~6% of
  step time at a fraction of full-unroll's compile cost;
- mod_depth is computed in the vectorized block phase (elementwise in env
  and v — no recurrence), not in the serial loop;
- sequential time grid, carry + ring buffers resident in VMEM:
  value ring (128), filtered ring (128), squared ring (256), product rings
  (8/16/32) — sized for the largest window (189 for the NFC-V listen box);
- running box sums maintained incrementally exactly like the reference's
  own float32 integrators (NfcA.cpp:246-250 et al.), with identical
  roundoff family; zero-filled rings reproduce the reference's warm-up.

Outputs (14 x f32 + detect_mask u8): env, filt, mdev, avg, mod_depth,
  bv12, bv24, bv47, bv94        raw-value boxes (A rates p2 + V p2)
  q47, q189                     squared-filtered boxes (A/V listen)
  p24x6, p47x12, p94x24         BPSK product boxes (A424/A212+B212/B106)
  detect_mask                   ALL-tech detect trigger bits packed into one
                                f32 integer (0..255): bits 0-2 NFC-A rates
                                (|SD| above corr threshold at power-ok
                                samples, NfcA.cpp:224-291), bits 3-4 NFC-B
                                falling-edge triggers at delays 0/94
                                (NfcB.cpp:283), bits 5-6 NFC-F correlation
                                (NfcF.cpp detect), bit 7 NFC-V signed SD
                                (NfcV.cpp:236-435).  The mask is computed
                                VECTORIZED once per time block from linear
                                VMEM history buffers of the box/filtered
                                streams (static-slice lookbacks — zero
                                scalar-addressed reads in the serial loop);
                                one packed output instead of per-tech mask
                                arrays keeps HBM write traffic flat while
                                covering every technology.  Stored as native
                                uint8 (exact integer 0..255): 1 byte/sample
                                of HBM writes and of link fetch.

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
# per-grid-step time block: 128 measures ~10% over 64 on v5e (the per-step
# grid/DMA bookkeeping amortizes over twice the samples); 256 exceeds VMEM
# with the resident-state variant.  Streams must be multiples of TILE.
import os as _os

TILE = int(_os.environ.get("NFCLAB_KERNEL_TILE", "128"))
# TILE=256 breaks the history-shift layout (the shift assumes every
# H_SIZES entry >= TILE); only tile sizes the validation suite has run are
# accepted so the env knob cannot silently corrupt a production path
if TILE not in (64, 128):
    raise ValueError(
        f"NFCLAB_KERNEL_TILE={TILE} is not a validated tile size (64, 128)"
    )
UNROLL = False  # +2.5% GS/s but ~25 min first compile; not worth cold-cache risk
# partial unroll of the serial per-sample loop: UF bodies inlined per
# fori_loop iteration cuts the loop's scalar bookkeeping overhead UF-fold
# at a fraction of full-unroll's compile time
UNROLL_FACTOR = int(_os.environ.get("NFCLAB_KERNEL_UNROLL", "16"))
_VMEM_LIMIT = int(_os.environ.get("NFCLAB_KERNEL_VMEM_MB", "100")) * 1024 * 1024

# 10 MS/s window set
BV_WIDTHS = (12, 24, 47, 94)
Q_WIDTHS = (47, 189)
PB = ((24, 6), (47, 12), (94, 24))  # (lag, box)

RV_RING = 128
RF_RING = 128
RQ_RING = 256
RP_RINGS = (8, 16, 32)

# NFC-A detect per rate: (delay cascade d, gap = p1-p2, p2, index of p2 in
# BV_WIDTHS); max history lookback = d + gap
A_RATES = ((0, 47, 47, 2), (94, 23, 24, 1), (141, 12, 12, 0))

# NFC-B falling-edge trigger delays (filtered-signal lookbacks)
B_DELAYS = (0, 94)
# NFC-F detect per rate: (d, gap, p2, A_RATES index naming the shared box) —
# F's SD reads the same bv24/bv12 box values as A rates 1/2
F_RATES = ((0, 23, 24, 1), (0, 12, 12, 2))
# NFC-V signed SD: (d, gap, p2, BV_WIDTHS index); lookback d+gap = 473
V_RATE = (378, 95, 94, 3)

# The detect masks are computed VECTORIZED per time block (outside the
# serial per-sample loop) from linear history buffers: each buffer holds
# [L, sub, 128] of past values followed by [TILE, sub, 128] of the current
# block, so every lookback `c` is the static slice [L-c : L-c+TILE].  L is
# the family's max lookback; histories advance by a TILE shift per block.
H_BV47 = 47    # A rate 0: lags 1 and 47
H_BV24 = 117   # A rate 1 (d=94): lags 94/95/117; F rate 1: lags 1/23
H_BV12 = 153   # A rate 2 (d=141): lags 141/142/153; F rate 2: lags 1/12
H_BV94 = 473   # V: lags 378 and 473
H_FILT = 94    # B falling-edge delay 94
H_SIZES = (H_BV47, H_BV24, H_BV12, H_BV94, H_FILT)

# detect_mask bit weights (f32-exact integers)
MASK_BITS_A = (1.0, 2.0, 4.0)
MASK_BITS_B = (8.0, 16.0)
MASK_BITS_F = (32.0, 64.0)
MASK_BIT_V = 128.0

N_OUT = 5 + len(BV_WIDTHS) + len(Q_WIDTHS) + len(PB) + 1

# Channels whose current time block the vectorized detect phase (and the
# history append) reads.  When one of these is excluded from the HBM output
# set it still gets a [TILE, sub, 128] VMEM scratch block the serial loop
# writes instead — the kernel is HBM-write-bound, so trimming unread outputs
# raises throughput proportionally (the batch TPU-fed decode consumes only
# the box channels + detect_mask; conditioning is host-recomputed there).
MASK_DEPS = ("envelope", "filtered", "bv12", "bv24", "bv47", "bv94")


# ring-state layout inside the carried state array [NSTATE, sub, 128]:
# every VMEM ring plus the conditioning carry and running sums, so a stream
# can be fed through the kernel in time chunks (state_out of chunk k is
# state_in of chunk k+1) with outputs bit-identical to one monolithic pass.
S_CARRY = 0
S_RV = S_CARRY + 8
S_RF = S_RV + RV_RING
S_RQ = S_RF + RF_RING
S_RP0 = S_RQ + RQ_RING
S_RP1 = S_RP0 + RP_RINGS[0]
S_RP2 = S_RP1 + RP_RINGS[1]
S_H = S_RP2 + RP_RINGS[2]
N_HIST = sum(h + TILE for h in H_SIZES)
S_SUMS = S_H + N_HIST
N_SUMS = len(BV_WIDTHS) + len(Q_WIDTHS) + len(PB)
NSTATE = S_SUMS + N_SUMS


def _hist_sections():
    secs = []
    off = S_H
    for h in H_SIZES:
        secs.append((off, h + TILE))
        off += h + TILE
    return tuple(secs)


# (section offset, length) pairs covering the carried state, in scratch
# order: carry, rv, rf, rq, rp0, rp1, rp2, histories (bv47/bv24/bv12/bv94/
# filt), sums
STATE_SECTIONS = (
    (S_CARRY, 8),
    (S_RV, RV_RING),
    (S_RF, RF_RING),
    (S_RQ, RQ_RING),
    (S_RP0, RP_RINGS[0]),
    (S_RP1, RP_RINGS[1]),
    (S_RP2, RP_RINGS[2]),
    *_hist_sections(),
    (S_SUMS, N_SUMS),
)


def _fused_kernel(params, mask_params, sub, n_t, base_ref, value_ref,
                  load_state, outs, blks, save_state,
                  carry, rv, rf, rq, rp0, rp1, rp2,
                  h47, h24, h12, h94, hfilt, sums):
    """Compute body: conditioning + channels over one [TILE, sub, 128] time
    block.  State residency is the caller's concern — `load_state()` fills
    the scratch rings at the first time block, `save_state()` persists them
    after the last (VMEM block copy or HBM DMA, see _jitted/_jitted_dma).

    `outs` maps every OUTPUT_NAMES entry to its _View or None (excluded from
    the HBM output set); `blks` holds raw [TILE, sub, 128] scratch refs for
    excluded MASK_DEPS channels so the detect phase still sees their current
    block.  Selection is static — the trace contains only selected stores."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    (enve_w0, enve_w1, mdev_w0, mdev_w1, mean_w0, mean_w1, iir_a, etu) = params
    (power_thr, a_thr, b_min_deep, f_thr, v_thr) = mask_params

    t_idx = pl.program_id(1)
    rps = (rp0, rp1, rp2)
    # absolute clock of this chunk's first sample (0 for a fresh stream; the
    # ring slot phases and the envelope seeding window depend on it)
    base = base_ref[0]

    @pl.when(t_idx == 0)
    def _():
        load_state()

    def put(name, j, val):
        v = outs[name]
        if v is not None:
            v[j] = val
        elif name in blks:
            blks[name][j] = val

    def body(j, _):
        t = base + t_idx * TILE + j
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

        put("envelope", j, new_env)
        put("filtered", j, filt)
        put("deviation", j, mdev)
        put("average", j, avg)
        # mod_depth is computed VECTORIZED in the block phase (pure
        # elementwise function of env and v — no recurrence)

        # raw-value boxes (ring sizes are powers of two: index with a
        # bitwise AND instead of rem — same value for the non-negative
        # clocks the kernel sees)
        s = 0
        slot_v = jax.lax.bitwise_and(t, RV_RING - 1)
        for w in BV_WIDTHS:
            old = rv[jax.lax.bitwise_and(t - w + RV_RING, RV_RING - 1)]
            sums[s] = sums[s] + v - old
            put(f"bv{w}", j, sums[s])
            s += 1
        rv[slot_v] = v

        # squared-filtered boxes
        q = filt * filt * 10.0
        slot_q = jax.lax.bitwise_and(t, RQ_RING - 1)
        for w in Q_WIDTHS:
            old = rq[jax.lax.bitwise_and(t - w + RQ_RING, RQ_RING - 1)]
            sums[s] = sums[s] + q - old
            put(f"q{w}", j, sums[s])
            s += 1
        rq[slot_q] = q

        # BPSK product boxes: prod = filt[t] * filt[t-lag] * 10
        slot_f = jax.lax.bitwise_and(t, RF_RING - 1)
        for (lag, box), rp, rsize in zip(PB, rps, RP_RINGS):
            lagged = rf[jax.lax.bitwise_and(t - lag + RF_RING, RF_RING - 1)]
            prod = filt * lagged * 10.0
            slot_p = jax.lax.bitwise_and(t, rsize - 1)
            old = rp[jax.lax.bitwise_and(t - box + rsize, rsize - 1)]
            sums[s] = sums[s] + prod - old
            put(f"p{lag}x{box}", j, sums[s])
            rp[slot_p] = prod
            s += 1
        rf[slot_f] = filt

        return 0

    if UNROLL:
        for j in range(TILE):
            body(j, 0)
    elif UNROLL_FACTOR > 1:
        uf = UNROLL_FACTOR
        assert TILE % uf == 0

        def blk_body(i, _):
            for u in range(uf):
                body(i * uf + u, 0)
            return 0

        jax.lax.fori_loop(0, TILE // uf, blk_body, 0)
    else:
        jax.lax.fori_loop(0, TILE, body, 0)

    # --- vectorized detect-mask phase (whole time block at once) ---
    # The serial loop above only maintains the running sums; the all-tech
    # detect triggers are pure functions of the box-sum/filtered streams at
    # fixed lookbacks, so they are computed here as static-slice shifts of
    # linear history buffers — no scalar-addressed VMEM reads in the hot
    # loop.  Values are the very ones the loop just wrote (to the HBM output
    # blocks, or to the `blks` VMEM scratch for excluded MASK_DEPS), so the
    # packed mask is bit-identical to the per-sample formulation.
    # SD formula (frontend.py):
    # sd(t) = ((B(t-d) - B(t-d-gap)) - (B(t-d-gap) - B(t-d-1))) / p2

    def cur_block(name):
        v = outs[name]
        return v.ref[0] if v is not None else blks[name][...]

    if outs["mod_depth"] is not None:
        # modulation depth (NfcTech.cpp:71-74): elementwise in env and v, so
        # it runs at vector efficiency here instead of in the serial loop
        # (same f32 ops per element — no FMA contraction in sub/min/max/div,
        # so values are bit-identical to the per-sample formulation)
        env_b = cur_block("envelope")
        v_b = value_ref.ref[0][...]
        clamped = jnp.maximum(0.0, jnp.minimum(v_b, env_b))
        outs["mod_depth"].ref[0] = (env_b - clamped) / env_b

    # histories advance by one TILE per block: shift left, append current.
    # The append always runs (even with detect_mask excluded) so the carried
    # state stays selection-independent for chunked streaming.
    blk_of = {
        47: (h47, H_BV47, "bv47"),
        24: (h24, H_BV24, "bv24"),
        12: (h12, H_BV12, "bv12"),
        94: (h94, H_BV94, "bv94"),
        "filt": (hfilt, H_FILT, "filtered"),
    }
    cur = {}
    for key, (hist, size, name) in blk_of.items():
        # left-to-right TILE-chunk shift: each chunk's source [i+1 .. i+2)
        # is disjoint from its destination [i .. i+1) and only overwritten
        # by the following chunk, so the overlap is safe by construction
        for i in range(0, size - size % TILE, TILE):
            hist[i : i + TILE] = hist[i + TILE : i + 2 * TILE]
        rem = size % TILE
        if rem:
            lo = size - rem
            hist[lo:size] = hist[lo + TILE : size + TILE]
        cur_blk = cur_block(name)
        hist[size : size + TILE] = cur_blk
        cur[key] = cur_blk

    def lagged(key, c):
        hist, size, _ = blk_of[key]
        if c == 0:
            return cur[key]
        return hist[size - c : size - c + TILE]

    if outs["detect_mask"] is not None:
        env_b = cur_block("envelope")
        power_ok = env_b >= power_thr
        mval = jnp.zeros((TILE, sub, 128), jnp.float32)

        # NFC-A: |SD| above the correlation threshold (NfcA.cpp:224-291)
        min_corr_a = a_thr * env_b
        for r, (d, gap, p2, widx) in enumerate(A_RATES):
            w = BV_WIDTHS[widx]
            b0 = lagged(w, d)
            b1 = lagged(w, d + 1)
            bg = lagged(w, d + gap)
            sd = ((b0 - bg) - (bg - b1)) / jnp.float32(p2)
            mask = power_ok & (jnp.abs(sd) > min_corr_a)
            mval += jnp.where(mask, jnp.float32(MASK_BITS_A[r]), 0.0)

        # NFC-F: same SD family over the bv24/bv12 boxes A rates 1/2 use
        min_corr_f = f_thr * env_b
        for r, (d, gap, p2, ridx) in enumerate(F_RATES):
            w = BV_WIDTHS[A_RATES[ridx][3]]
            b0 = lagged(w, 0)
            b1 = lagged(w, 1)
            bg = lagged(w, gap)
            sd = ((b0 - bg) - (bg - b1)) / jnp.float32(p2)
            mask = power_ok & (jnp.abs(sd) > min_corr_f)
            mval += jnp.where(mask, jnp.float32(MASK_BITS_F[r]), 0.0)

        # NFC-B: falling edge filt[t-d] < -(minDeep*env) (NfcB.cpp:283)
        edge_b = -(b_min_deep * env_b)
        for r, d in enumerate(B_DELAYS):
            fd = lagged("filt", d)
            mask = power_ok & (fd < edge_b)
            mval += jnp.where(mask, jnp.float32(MASK_BITS_B[r]), 0.0)

        # NFC-V: signed SD = (B(u-gap)-B(u))/p2 > thr*env (NfcV.cpp:236-435)
        dv, gapv, p2v, _widxv = V_RATE
        u0 = lagged(94, dv)
        ug = lagged(94, dv + gapv)
        sd_v = (ug - u0) / jnp.float32(p2v)
        mask_v = power_ok & (sd_v > v_thr * env_b)
        mval += jnp.where(mask_v, jnp.float32(MASK_BIT_V), 0.0)

        # the mask is an exact integer 0..255 — stored as native uint8 so
        # every select writes 1 byte/sample instead of 4 (the full output
        # set is HBM-write-bound) and the mask frontend's device-side cast
        # pass disappears
        # (Mosaic has no direct f32->u8 cast; hop through int32)
        outs["detect_mask"].ref[0] = mval.astype(jnp.int32).astype(
            outs["detect_mask"].ref.dtype
        )

    @pl.when(t_idx == n_t - 1)
    def _():
        save_state()


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


def _normalize_select(select):
    """None (all outputs) or iterable of names -> tuple in OUTPUT_NAMES
    order, validated.  The tuple is the lru_cache key component."""
    if select is None:
        return tuple(OUTPUT_NAMES)
    sel = set(select)
    unknown = sel - set(OUTPUT_NAMES)
    if unknown:
        raise ValueError(f"unknown fused-frontend outputs: {sorted(unknown)}")
    return tuple(n for n in OUTPUT_NAMES if n in sel)


@functools.lru_cache(maxsize=8)
def _jitted(params, mask_params, g: int, t: int, sub: int,
            sel: tuple = None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_t = t // TILE
    sel = _normalize_select(sel)
    n_sel = len(sel)
    # excluded MASK_DEPS still need a [TILE, sub, 128] VMEM block the serial
    # loop writes so the detect phase / history append sees their current
    # block without an HBM output allocation
    excl_deps = tuple(n for n in MASK_DEPS if n not in sel)

    tile_spec = pl.BlockSpec(
        (1, TILE, sub, 128), lambda b, i: (b, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    state_spec = pl.BlockSpec(
        (1, NSTATE, sub, 128), lambda b, i: (b, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    base_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    n_sec = len(STATE_SECTIONS)

    def kernel(base_ref, value_ref, state_in_ref, *rest):
        state_out_ref = rest[n_sel]
        scratch = rest[n_sel + 1 : n_sel + 1 + n_sec]
        outs = {n: None for n in OUTPUT_NAMES}
        for n, r in zip(sel, rest[:n_sel]):
            outs[n] = _View(r)
        blks = dict(zip(excl_deps, rest[n_sel + 1 + n_sec :]))

        def load_state():
            for (off, ln), buf in zip(STATE_SECTIONS, scratch):
                buf[...] = state_in_ref[0, off : off + ln]

        def save_state():
            for (off, ln), buf in zip(STATE_SECTIONS, scratch):
                state_out_ref[0, off : off + ln] = buf[...]

        _fused_kernel(
            params, mask_params, sub, n_t, base_ref, _View(value_ref),
            load_state, outs, blks, save_state, *scratch,
        )

    out_shape = [
        jax.ShapeDtypeStruct((g, t, sub, 128), OUTPUT_DTYPES[n])
        for n in sel
    ]
    out_shape.append(jax.ShapeDtypeStruct((g, NSTATE, sub, 128), jnp.float32))

    def run(base, value, state):
        return pl.pallas_call(
            kernel,
            grid=(g, n_t),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            in_specs=[base_spec, tile_spec, state_spec],
            out_specs=[tile_spec] * n_sel + [state_spec],
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((8, sub, 128), jnp.float32),  # carry + prev boxes
                pltpu.VMEM((RV_RING, sub, 128), jnp.float32),
                pltpu.VMEM((RF_RING, sub, 128), jnp.float32),
                pltpu.VMEM((RQ_RING, sub, 128), jnp.float32),
                pltpu.VMEM((RP_RINGS[0], sub, 128), jnp.float32),
                pltpu.VMEM((RP_RINGS[1], sub, 128), jnp.float32),
                pltpu.VMEM((RP_RINGS[2], sub, 128), jnp.float32),
                pltpu.VMEM((H_BV47 + TILE, sub, 128), jnp.float32),
                pltpu.VMEM((H_BV24 + TILE, sub, 128), jnp.float32),
                pltpu.VMEM((H_BV12 + TILE, sub, 128), jnp.float32),
                pltpu.VMEM((H_BV94 + TILE, sub, 128), jnp.float32),
                pltpu.VMEM((H_FILT + TILE, sub, 128), jnp.float32),
                pltpu.VMEM((N_SUMS, sub, 128), jnp.float32),
            ] + [
                pltpu.VMEM((TILE, sub, 128), jnp.float32) for _ in excl_deps
            ],
        )(base, value, state)

    return jax.jit(run)


@functools.lru_cache(maxsize=8)
def _jitted_dma(params, mask_params, g: int, t: int, sub: int,
                sel: tuple = None):
    """DMA-state variant: the carried state lives in HBM (memory space ANY)
    and is copied section-by-section into the VMEM scratch rings at the
    first time block (and back at the last) with explicit async DMAs.

    Keeping the (NSTATE, sub, 128) state blocks out of VMEM residency frees
    ~2x state bytes of VMEM, which is what makes sub=32 tiles fit — wider
    tiles amortize the serial per-step loop latency over more streams."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_t = t // TILE
    n_sec = len(STATE_SECTIONS)
    sel = _normalize_select(sel)
    n_sel = len(sel)
    excl_deps = tuple(n for n in MASK_DEPS if n not in sel)

    tile_spec = pl.BlockSpec(
        (1, TILE, sub, 128), lambda b, i: (b, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    base_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def kernel(base_ref, value_ref, state_in_ref, *rest):
        state_out_ref = rest[n_sel]
        scratch = rest[n_sel + 1 : n_sel + 1 + n_sec]
        sems = rest[n_sel + 1 + n_sec]
        outs = {n: None for n in OUTPUT_NAMES}
        for n, r in zip(sel, rest[:n_sel]):
            outs[n] = _View(r)
        blks = dict(zip(excl_deps, rest[n_sel + 2 + n_sec :]))
        b = pl.program_id(0)

        def load_state():
            dmas = [
                pltpu.make_async_copy(
                    state_in_ref.at[b, pl.ds(off, ln)], buf, sems.at[i]
                )
                for i, ((off, ln), buf) in enumerate(
                    zip(STATE_SECTIONS, scratch)
                )
            ]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        def save_state():
            dmas = [
                pltpu.make_async_copy(
                    buf, state_out_ref.at[b, pl.ds(off, ln)], sems.at[i]
                )
                for i, ((off, ln), buf) in enumerate(
                    zip(STATE_SECTIONS, scratch)
                )
            ]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        _fused_kernel(
            params, mask_params, sub, n_t, base_ref, _View(value_ref),
            load_state, outs, blks, save_state, *scratch,
        )

    out_shape = [
        jax.ShapeDtypeStruct((g, t, sub, 128), OUTPUT_DTYPES[n])
        for n in sel
    ]
    out_shape.append(jax.ShapeDtypeStruct((g, NSTATE, sub, 128), jnp.float32))

    def run(base, value, state):
        return pl.pallas_call(
            kernel,
            grid=(g, n_t),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            in_specs=[base_spec, tile_spec, any_spec],
            out_specs=[tile_spec] * n_sel + [any_spec],
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((8, sub, 128), jnp.float32),  # carry + prev boxes
                pltpu.VMEM((RV_RING, sub, 128), jnp.float32),
                pltpu.VMEM((RF_RING, sub, 128), jnp.float32),
                pltpu.VMEM((RQ_RING, sub, 128), jnp.float32),
                pltpu.VMEM((RP_RINGS[0], sub, 128), jnp.float32),
                pltpu.VMEM((RP_RINGS[1], sub, 128), jnp.float32),
                pltpu.VMEM((RP_RINGS[2], sub, 128), jnp.float32),
                pltpu.VMEM((H_BV47 + TILE, sub, 128), jnp.float32),
                pltpu.VMEM((H_BV24 + TILE, sub, 128), jnp.float32),
                pltpu.VMEM((H_BV12 + TILE, sub, 128), jnp.float32),
                pltpu.VMEM((H_BV94 + TILE, sub, 128), jnp.float32),
                pltpu.VMEM((H_FILT + TILE, sub, 128), jnp.float32),
                pltpu.VMEM((N_SUMS, sub, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((len(STATE_SECTIONS),)),
            ] + [
                pltpu.VMEM((TILE, sub, 128), jnp.float32) for _ in excl_deps
            ],
        )(base, value, state)

    return jax.jit(run)


OUTPUT_NAMES = (
    ["envelope", "filtered", "deviation", "average", "mod_depth"]
    + [f"bv{w}" for w in BV_WIDTHS]
    + [f"q{w}" for w in Q_WIDTHS]
    + [f"p{lag}x{box}" for lag, box in PB]
    + ["detect_mask"]
)

# per-output HBM dtypes: the packed detect mask is an exact integer 0..255,
# stored as native uint8 (1 byte/sample; the full output set is write-bound)
OUTPUT_DTYPES = {
    n: (np.uint8 if n == "detect_mask" else np.float32) for n in OUTPUT_NAMES
}

# detect_mask bit layout: (name, weight)
MASK_LAYOUT = (
    [(f"mask_a_{r}", int(w)) for r, w in enumerate(MASK_BITS_A)]
    + [(f"mask_b_{d}", int(w)) for d, w in zip(B_DELAYS, MASK_BITS_B)]
    + [(f"mask_f_{r}", int(w)) for r, w in zip((1, 2), MASK_BITS_F)]
    + [("mask_v", int(MASK_BIT_V))]
)


def unpack_detect_mask(mask):
    """detect_mask f32 bitfield -> dict of per-tech/rate boolean arrays."""
    import jax.numpy as jnp

    bits = mask.astype(jnp.int32)
    return {
        name: (bits & w) != 0
        for name, w in MASK_LAYOUT
    }


@functools.lru_cache(maxsize=1)
def _enable_persistent_cache() -> None:
    """Point jax at the repo-local compilation cache so every consumer of
    the fused kernel (decode paths, farm, bench, validate tools) shares
    compiled artifacts across processes — remote TPU compiles run minutes,
    cache hits run milliseconds."""
    import os

    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))),
        ".jax_cache",
    )
    if jax.config.jax_compilation_cache_dir:  # app already configured one
        return
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def fused_frontend(value, params, native_layout=False,
                   mask_params=(0.01, 0.75, 0.10, 0.50, 0.50),
                   state=None, base=0, return_state=False, sub=None,
                   select=None):
    """value: [B, T], B % 1024 == 0, T % TILE == 0.

    native_layout=False: dict of [B, T] f32 (pays one transpose per output).
    native_layout=True:  dict of [g, t, sub, 128] f32 (kernel-native tiling;
    with lanes = sub * 128, stream b lives at
    [b // lanes, :, (b % lanes) // 128, b % 128]).
    mask_params: (power_level_threshold, nfca_corr_thr, nfcb_min_deep,
    nfcf_corr_thr, nfcv_corr_thr).

    select: None for all OUTPUT_NAMES, or an iterable of names — only the
    selected channels are written to HBM (the kernel is HBM-write-bound, so
    trimming unread outputs raises throughput near-proportionally; excluded
    MASK_DEPS channels are kept in VMEM scratch for the detect phase).
    Selected values are bit-identical to the unselected run's.

    Chunked streaming: pass `state` (the previous chunk's carried state, or
    None at stream start), `base` (this chunk's absolute start clock, int32
    range) and `return_state=True`; outputs are bit-identical to one
    monolithic pass over the concatenated chunks."""
    import jax.numpy as jnp

    _enable_persistent_cache()
    sel = _normalize_select(select)
    b, t = value.shape
    assert b % LANES == 0 and t % TILE == 0
    assert base >= 0  # ring slots index with AND; clocks must be non-negative
    # wider tiles amortize the serial per-step latency over more streams:
    # sub=16 measures ~1.5x sub=8 on v5e (the serial loop's step latency is
    # the bottleneck at sub=8).  sub=32 only fits in VMEM with the DMA-state
    # variant (_jitted_dma, bit-exact) but measures speed-neutral vs sub=16
    # on v5e — at 16 the kernel is already output-bandwidth-bound — so 16
    # stays the default; sub=8 remains for 1024-stream batches.
    if sub is None:
        sub = 16 if b % 2048 == 0 else 8
    assert b % (128 * sub) == 0
    lanes = 128 * sub
    g = b // lanes
    vt = (
        jnp.asarray(value, jnp.float32)
        .reshape(g, sub, 128, t)
        .transpose(0, 3, 1, 2)
    )
    if state is None:
        state = jnp.zeros((g, NSTATE, sub, 128), jnp.float32)
    base_arr = jnp.asarray([base], jnp.int32)
    mp = tuple(np.float32(m) for m in mask_params)
    impl = _jitted_dma if sub >= 32 else _jitted
    outs = impl(params, mp, g, t, sub, sel)(base_arr, vt, state)
    state_out = outs[-1]
    res = {}
    for name, o in zip(sel, outs[:-1]):
        res[name] = o if native_layout else o.transpose(0, 2, 3, 1).reshape(b, t)
    if return_state:
        return res, state_out
    return res


def fused_frontend_stream(value, params, chunk=1 << 16, native_layout=False,
                          mask_params=(0.01, 0.75, 0.10, 0.50, 0.50),
                          select=None):
    """Generator: feed [B, T] through the kernel in `chunk`-sample slices
    with carried ring state, yielding (offset, outputs) per chunk.  Device
    memory is bounded by one chunk's outputs; the concatenated outputs are
    bit-identical to a single monolithic kernel pass (validated on TPU by
    tools/validate_fused)."""
    import jax.numpy as jnp

    b, t = value.shape
    assert chunk % TILE == 0
    value = jnp.asarray(value, jnp.float32)
    state = None
    for off in range(0, t, chunk):
        end = min(off + chunk, t)
        if (end - off) % TILE:
            raise ValueError("stream length must be a multiple of TILE")
        res, state = fused_frontend(
            value[:, off:end], params, native_layout=native_layout,
            mask_params=mask_params, state=state, base=off,
            return_state=True, select=select,
        )
        yield off, res
