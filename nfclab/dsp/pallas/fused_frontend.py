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

The kernel geometry is RATE-PARAMETRIC (kernel_plan): box widths, ring
sizes, detect cascades and history lengths derive from the same bitrate
tables the host FSMs use, so any capture rate gets its own compiled
variant — the reference re-derives these tables on every sample-rate
change (NfcDecoder.cpp:382-388).  The constants documented above are the
10 MS/s instance.
"""

from __future__ import annotations

import functools
import typing

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

# detect_mask bit weights (f32-exact integers)
MASK_BITS_A = (1.0, 2.0, 4.0)
MASK_BITS_B = (8.0, 16.0)
MASK_BITS_F = (32.0, 64.0)
MASK_BIT_V = 128.0


def _pow2_at_least(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class KernelPlan(typing.NamedTuple):
    """Rate-parametric kernel geometry: box-window widths, VMEM ring
    sizes, detect-cascade parameters and history lengths, all derived from
    the same bitrate tables the host FSMs use (core.params.nfca_bitrates,
    demod.nfcv.nfcv_bitrate — the reference re-derives these on any
    sample-rate change, NfcDecoder.cpp:382-388).  A plan is hashable: it
    is part of every jit cache key, so each capture rate compiles its own
    kernel variant once."""

    bv_widths: tuple          # raw-value box widths (A p2 set + V p2)
    q_widths: tuple           # squared-filtered box widths
    pb: tuple                 # BPSK (lag, box) pairs, ascending by lag
    rv_ring: int              # value ring (pow2 > max bv width)
    rf_ring: int              # filtered ring (pow2 > max pb lag)
    rq_ring: int              # squared ring (pow2 > max q width)
    rp_rings: tuple           # product rings (pow2 > box) per pb entry
    a_rates: tuple            # (d, gap, p2, widx into bv_widths) per A rate
    f_rates: tuple            # (d, gap, p2, widx) per F rate
    b_delays: tuple           # filtered-signal lookback delays
    v_rate: tuple             # (d, gap, p2, widx)
    h_bv: tuple               # history length per bv width (max lookback)
    h_filt: int               # filtered history length

    @property
    def h_sizes(self) -> tuple:
        return (*self.h_bv, self.h_filt)

    @property
    def n_sums(self) -> int:
        return len(self.bv_widths) + len(self.q_widths) + len(self.pb)

    @property
    def state_sections(self) -> tuple:
        """(offset, length) pairs covering the carried state, in scratch
        order: carry, rv, rf, rq, product rings, histories (per bv width
        then filt), sums."""
        secs = []
        off = 0
        for ln in (8, self.rv_ring, self.rf_ring, self.rq_ring,
                   *self.rp_rings,
                   *(h + TILE for h in self.h_sizes), self.n_sums):
            secs.append((off, ln))
            off += ln
        return tuple(secs)

    @property
    def nstate(self) -> int:
        off, ln = self.state_sections[-1]
        return off + ln

    @property
    def output_names(self) -> tuple:
        return (
            "envelope", "filtered", "deviation", "average", "mod_depth",
            *(f"bv{w}" for w in self.bv_widths),
            *(f"q{w}" for w in self.q_widths),
            *(f"p{lag}x{box}" for lag, box in self.pb),
            "detect_mask",
        )

    @property
    def mask_deps(self) -> tuple:
        """Channels whose current time block the vectorized detect phase
        (and the history append) reads; excluded ones keep a VMEM scratch
        block."""
        return ("envelope", "filtered",
                *(f"bv{w}" for w in self.bv_widths))

    @property
    def fold_modulus(self) -> int:
        """Clock-fold modulus for unbounded streams: every ring size must
        divide it so folded clocks keep identical ring phases."""
        return max(
            512, self.rv_ring, self.rf_ring, self.rq_ring, *self.rp_rings
        )


@functools.lru_cache(maxsize=16)
def kernel_plan(sample_rate: int) -> KernelPlan:
    """Derive the kernel geometry for a capture rate (see KernelPlan)."""
    from ...core.params import nfca_bitrates
    from ...demod.nfcv import nfcv_bitrate

    bra = nfca_bitrates(sample_rate)
    brv = nfcv_bitrate(sample_rate)
    bv = tuple(sorted({br.period2 for br in bra} | {brv.period2}))
    q = tuple(sorted({bra[0].period2, brv.period1}))
    pb = tuple(sorted((br.period1, br.period4) for br in bra))
    widx = {w: i for i, w in enumerate(bv)}
    a_rates = tuple(
        (br.symbol_delay_detect, br.period1 - br.period2, br.period2,
         widx[br.period2])
        for br in bra
    )
    f_rates = tuple(
        (0, br.period1 - br.period2, br.period2, widx[br.period2])
        for br in bra[1:]
    )
    b_delays = tuple(br.symbol_delay_detect for br in bra[:2])
    v_rate = (
        brv.symbol_delay_detect, brv.period1 - brv.period2, brv.period2,
        widx[brv.period2],
    )
    # history length per bv width = max lookback over its detect consumers
    # (A: d+gap and d+1; F: gap and 1; V: d+gap)
    h_bv = []
    for w in bv:
        need = 1
        for d, gap, p2, wi in a_rates:
            if p2 == w:
                need = max(need, d + gap, d + 1)
        for d, gap, p2, wi in f_rates:
            if p2 == w:
                need = max(need, gap, 1)
        if v_rate[2] == w:
            need = max(need, v_rate[0] + v_rate[1])
        h_bv.append(need)
    return KernelPlan(
        bv_widths=bv,
        q_widths=q,
        pb=pb,
        rv_ring=_pow2_at_least(max(bv) + 1),
        rf_ring=_pow2_at_least(max(lag for lag, _ in pb) + 1),
        rq_ring=_pow2_at_least(max(q) + 1),
        rp_rings=tuple(_pow2_at_least(box + 1) for _, box in pb),
        a_rates=a_rates,
        f_rates=f_rates,
        b_delays=b_delays,
        v_rate=v_rate,
        h_bv=tuple(h_bv),
        h_filt=max(b_delays),
    )


# the reference's recommended 10 MS/s rate: module-level aliases kept for
# the (many) importers of the original constants; tests assert the derived
# plan reproduces them exactly
def _plan_10m() -> KernelPlan:
    return kernel_plan(10_000_000)


_P10 = _plan_10m()
BV_WIDTHS = _P10.bv_widths          # (12, 24, 47, 94)
Q_WIDTHS = _P10.q_widths            # (47, 189)
PB = _P10.pb                        # ((24, 6), (47, 12), (94, 24))
RV_RING = _P10.rv_ring              # 128
RF_RING = _P10.rf_ring              # 128
RQ_RING = _P10.rq_ring              # 256
RP_RINGS = _P10.rp_rings            # (8, 16, 32)
A_RATES = _P10.a_rates
B_DELAYS = _P10.b_delays
F_RATES = _P10.f_rates
V_RATE = _P10.v_rate
H_SIZES = _P10.h_sizes              # (47, 117, 153, 473, 94)
MASK_DEPS = _P10.mask_deps
NSTATE = _P10.nstate
STATE_SECTIONS = _P10.state_sections
N_OUT = len(_P10.output_names)


def _fused_kernel(plan, params, mask_params, sub, n_t, base_ref, value_ref,
                  load_state, outs, blks, save_state, scratch):
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
    carry, rv, rf, rq = scratch[0:4]
    nrp = len(plan.rp_rings)
    rps = scratch[4 : 4 + nrp]
    hists = scratch[4 + nrp : 4 + nrp + len(plan.h_sizes)]
    sums = scratch[4 + nrp + len(plan.h_sizes)]
    RV_RING, RF_RING, RQ_RING = plan.rv_ring, plan.rf_ring, plan.rq_ring
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
        for w in plan.bv_widths:
            old = rv[jax.lax.bitwise_and(t - w + RV_RING, RV_RING - 1)]
            sums[s] = sums[s] + v - old
            put(f"bv{w}", j, sums[s])
            s += 1
        rv[slot_v] = v

        # squared-filtered boxes
        q = filt * filt * 10.0
        slot_q = jax.lax.bitwise_and(t, RQ_RING - 1)
        for w in plan.q_widths:
            old = rq[jax.lax.bitwise_and(t - w + RQ_RING, RQ_RING - 1)]
            sums[s] = sums[s] + q - old
            put(f"q{w}", j, sums[s])
            s += 1
        rq[slot_q] = q

        # BPSK product boxes: prod = filt[t] * filt[t-lag] * 10
        slot_f = jax.lax.bitwise_and(t, RF_RING - 1)
        for (lag, box), rp, rsize in zip(plan.pb, rps, plan.rp_rings):
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
        w: (hists[i], plan.h_bv[i], f"bv{w}")
        for i, w in enumerate(plan.bv_widths)
    }
    blk_of["filt"] = (hists[-1], plan.h_filt, "filtered")
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
        for r, (d, gap, p2, widx) in enumerate(plan.a_rates):
            w = plan.bv_widths[widx]
            b0 = lagged(w, d)
            b1 = lagged(w, d + 1)
            bg = lagged(w, d + gap)
            sd = ((b0 - bg) - (bg - b1)) / jnp.float32(p2)
            mask = power_ok & (jnp.abs(sd) > min_corr_a)
            mval += jnp.where(mask, jnp.float32(MASK_BITS_A[r]), 0.0)

        # NFC-F: same SD family over the boxes A rates 1/2 use
        min_corr_f = f_thr * env_b
        for r, (d, gap, p2, widx) in enumerate(plan.f_rates):
            w = plan.bv_widths[widx]
            b0 = lagged(w, 0)
            b1 = lagged(w, 1)
            bg = lagged(w, gap)
            sd = ((b0 - bg) - (bg - b1)) / jnp.float32(p2)
            mask = power_ok & (jnp.abs(sd) > min_corr_f)
            mval += jnp.where(mask, jnp.float32(MASK_BITS_F[r]), 0.0)

        # NFC-B: falling edge filt[t-d] < -(minDeep*env) (NfcB.cpp:283)
        edge_b = -(b_min_deep * env_b)
        for r, d in enumerate(plan.b_delays):
            fd = lagged("filt", d)
            mask = power_ok & (fd < edge_b)
            mval += jnp.where(mask, jnp.float32(MASK_BITS_B[r]), 0.0)

        # NFC-V: signed SD = (B(u-gap)-B(u))/p2 > thr*env (NfcV.cpp:236-435)
        dv, gapv, p2v, widxv = plan.v_rate
        wv = plan.bv_widths[widxv]
        u0 = lagged(wv, dv)
        ug = lagged(wv, dv + gapv)
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


def _normalize_select(select, plan: KernelPlan = None):
    """None (all outputs) or iterable of names -> tuple in the plan's
    output order, validated.  The tuple is the lru_cache key component."""
    names = (plan or _P10).output_names
    if select is None:
        return tuple(names)
    sel = set(select)
    unknown = sel - set(names)
    if unknown:
        raise ValueError(f"unknown fused-frontend outputs: {sorted(unknown)}")
    return tuple(n for n in names if n in sel)


def _scratch_shapes(plan: KernelPlan, sub: int, excl_deps: tuple):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    return [
        pltpu.VMEM((8, sub, 128), jnp.float32),  # carry + prev boxes
        pltpu.VMEM((plan.rv_ring, sub, 128), jnp.float32),
        pltpu.VMEM((plan.rf_ring, sub, 128), jnp.float32),
        pltpu.VMEM((plan.rq_ring, sub, 128), jnp.float32),
        *(pltpu.VMEM((r, sub, 128), jnp.float32) for r in plan.rp_rings),
        *(pltpu.VMEM((h + TILE, sub, 128), jnp.float32)
          for h in plan.h_sizes),
        pltpu.VMEM((plan.n_sums, sub, 128), jnp.float32),
    ] + [pltpu.VMEM((TILE, sub, 128), jnp.float32) for _ in excl_deps]


@functools.lru_cache(maxsize=16)
def _jitted(params, mask_params, g: int, t: int, sub: int,
            sel: tuple = None, plan: KernelPlan = None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = plan or _P10
    n_t = t // TILE
    sel = _normalize_select(sel, plan)
    n_sel = len(sel)
    # excluded mask-dep channels still need a [TILE, sub, 128] VMEM block
    # the serial loop writes so the detect phase / history append sees
    # their current block without an HBM output allocation
    excl_deps = tuple(n for n in plan.mask_deps if n not in sel)
    sections = plan.state_sections
    nstate = plan.nstate

    tile_spec = pl.BlockSpec(
        (1, TILE, sub, 128), lambda b, i: (b, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    state_spec = pl.BlockSpec(
        (1, nstate, sub, 128), lambda b, i: (b, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    base_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    n_sec = len(sections)

    def kernel(base_ref, value_ref, state_in_ref, *rest):
        state_out_ref = rest[n_sel]
        scratch = rest[n_sel + 1 : n_sel + 1 + n_sec]
        outs = {n: None for n in plan.output_names}
        for n, r in zip(sel, rest[:n_sel]):
            outs[n] = _View(r)
        blks = dict(zip(excl_deps, rest[n_sel + 1 + n_sec :]))

        def load_state():
            for (off, ln), buf in zip(sections, scratch):
                buf[...] = state_in_ref[0, off : off + ln]

        def save_state():
            for (off, ln), buf in zip(sections, scratch):
                state_out_ref[0, off : off + ln] = buf[...]

        _fused_kernel(
            plan, params, mask_params, sub, n_t, base_ref,
            _View(value_ref), load_state, outs, blks, save_state, scratch,
        )

    out_shape = [
        jax.ShapeDtypeStruct(
            (g, t, sub, 128),
            np.uint8 if n == "detect_mask" else np.float32,
        )
        for n in sel
    ]
    out_shape.append(jax.ShapeDtypeStruct((g, nstate, sub, 128), jnp.float32))

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
            scratch_shapes=_scratch_shapes(plan, sub, excl_deps),
        )(base, value, state)

    return jax.jit(run)


@functools.lru_cache(maxsize=16)
def _jitted_dma(params, mask_params, g: int, t: int, sub: int,
                sel: tuple = None, plan: KernelPlan = None):
    """DMA-state variant: the carried state lives in HBM (memory space ANY)
    and is copied section-by-section into the VMEM scratch rings at the
    first time block (and back at the last) with explicit async DMAs.

    Keeping the (nstate, sub, 128) state blocks out of VMEM residency frees
    ~2x state bytes of VMEM, which is what makes sub=32 tiles fit — wider
    tiles amortize the serial per-step loop latency over more streams."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = plan or _P10
    n_t = t // TILE
    sections = plan.state_sections
    n_sec = len(sections)
    sel = _normalize_select(sel, plan)
    n_sel = len(sel)
    excl_deps = tuple(n for n in plan.mask_deps if n not in sel)

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
        outs = {n: None for n in plan.output_names}
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
                    zip(sections, scratch)
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
                    zip(sections, scratch)
                )
            ]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        _fused_kernel(
            plan, params, mask_params, sub, n_t, base_ref,
            _View(value_ref), load_state, outs, blks, save_state, scratch,
        )

    out_shape = [
        jax.ShapeDtypeStruct(
            (g, t, sub, 128),
            np.uint8 if n == "detect_mask" else np.float32,
        )
        for n in sel
    ]
    out_shape.append(
        jax.ShapeDtypeStruct((g, plan.nstate, sub, 128), jnp.float32)
    )

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
            scratch_shapes=_scratch_shapes(plan, sub, ()) + [
                pltpu.SemaphoreType.DMA((n_sec,)),
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
                   select=None, sample_rate=10_000_000):
    """value: [B, T], B % 1024 == 0, T % TILE == 0.

    sample_rate selects the kernel geometry (box widths, ring sizes,
    detect cascades — kernel_plan): any capture rate compiles its own
    bucketed variant, reproducing NfcDecoder.cpp:382-388's re-derivation
    on rate change.  Output names are the rate's box_keys names.

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
    plan = kernel_plan(sample_rate)
    sel = _normalize_select(select, plan)
    b, t = value.shape
    assert b % LANES == 0 and t % TILE == 0
    assert base >= 0  # ring slots index with AND; clocks must be non-negative
    if state is not None and state.shape[1] != plan.nstate:
        raise ValueError(
            f"carried state extent {state.shape[1]} does not match "
            f"kernel_plan({sample_rate}).nstate={plan.nstate} — state from "
            "a different rate's plan?"
        )
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
        state = jnp.zeros((g, plan.nstate, sub, 128), jnp.float32)
    base_arr = jnp.asarray([base], jnp.int32)
    mp = tuple(np.float32(m) for m in mask_params)
    impl = _jitted_dma if sub >= 32 else _jitted
    outs = impl(params, mp, g, t, sub, sel, plan)(base_arr, vt, state)
    state_out = outs[-1]
    res = {}
    for name, o in zip(sel, outs[:-1]):
        res[name] = o if native_layout else o.transpose(0, 2, 3, 1).reshape(b, t)
    if return_state:
        return res, state_out
    return res


def fused_frontend_stream(value, params, chunk=1 << 16, native_layout=False,
                          mask_params=(0.01, 0.75, 0.10, 0.50, 0.50),
                          select=None, sample_rate=10_000_000):
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
            return_state=True, select=select, sample_rate=sample_rate,
        )
        yield off, res
