"""TPU-computed correlator channels feeding the host symbol walk.

The fused Pallas frontend (dsp/pallas/fused_frontend.py) produces every box
channel and all-tech detect triggers at ~10 GS/s/chip.  This module maps one
capture onto that batched kernel with temporal overlap-save blocks and
preloads the results into a decode context's ``LazyChannels`` cache, so the
event walker (and the native detect/decode FSMs) consume device-computed
channels instead of recomputing them on the host — the TPU-native analog of
moving the reference's per-sample integrators (NfcA.cpp:236-255 et al.) off
the CPU.

Block scheme: the capture is cut into ``L``-sample bodies, each preceded by
an ``H``-sample halo; every (halo + body) window runs as an independent
stream from zero kernel state.  Conditioning memory is short (envelope
w0 = 0.95, IIR a = 0.9 at 10 MS/s; silence window 10*ETU ~ 944 samples) and
box lookbacks are <= 474 samples + 1024 ring warm-up, so an 8k halo makes
every body sample's channel value converge to the continuous-stream value
within f32 roundoff.  Block 0 needs no halo (zero state IS the stream
start).  The box sums carry the kernel's f32 running-sum roundoff family —
the same family as the reference's own integrators (NfcA.cpp:246-250) — so
frames are validated by golden equality (tools/validate_tpu_decode), while
the bit-exact contract path remains the host f64 channels.

Detect-trigger indices come from the kernel's packed ``detect_mask`` bits,
gated at clock >= 1024 exactly like the host index channels
(channels.py _WARMUP).
"""

from __future__ import annotations

import functools
import threading

import numpy as np

from ..core.params import SignalParams, nfca_bitrates

# body / halo sizes; H + L must be a multiple of the kernel TILE (64)
DEFAULT_L = 24576
DEFAULT_H = 8192

_WARMUP = 1024  # detect indices start here (channels.py / NfcA.cpp:220-221)

# relative loosening of the A/F/V SD trigger thresholds in the MASK-ONLY
# frontend, covering the kernel-f32 vs host-f64 box-sum roundoff divergence
# with orders-of-magnitude headroom (measured divergence is ~1e-5 relative;
# extra trigger candidates are always safe, missing ones never are)
MASK_ONLY_MARGIN = 1.0 / 256

def channel_plan(sample_rate: int) -> dict:
    """Rate-parametric derivation of the decode channel set — the general
    form of the fused kernel's 10 MS/s constants (fused_frontend.py
    A_RATES/B_DELAYS/F_RATES/V_RATE/BV_WIDTHS/Q_WIDTHS/PB), built from the
    same bitrate tables the host FSMs use (core.params.nfca_bitrates,
    demod.nfcv.nfcv_bitrate).  Consumed by the mesh-sharded frontend
    (shard/multichip.py) so any capture rate shards; asserted to reproduce
    the kernel constants at 10 MS/s (tests/test_multichip.py)."""
    from ..demod.nfcv import nfcv_bitrate

    bra = nfca_bitrates(sample_rate)
    brv = nfcv_bitrate(sample_rate)
    bv = sorted({br.period2 for br in bra} | {brv.period2})
    # box_sq consumers: A 106k ASK listen (p2), V listen (p1)
    q = sorted({bra[0].period2, brv.period1})
    # box_bpsk consumers: BPSK listen product integrators, (p1, p4) per A
    # rate (B 106k shares A's table)
    pb = sorted(((br.period1, br.period4) for br in bra), reverse=True)
    return {
        "bv": tuple(bv),
        "q": tuple(q),
        "pb": tuple(pb),
        # detect-trigger parameter tuples (d, gap, p2, box width)
        "a_rates": tuple(
            (br.symbol_delay_detect, br.period1 - br.period2, br.period2)
            for br in bra
        ),
        "b_delays": tuple(br.symbol_delay_detect for br in bra[:2]),
        "f_rates": tuple(
            (0, br.period1 - br.period2, br.period2) for br in bra[1:]
        ),
        "v_rate": (
            brv.symbol_delay_detect, brv.period1 - brv.period2, brv.period2
        ),
    }


def box_keys(sample_rate: int) -> dict:
    """Channel name -> (LazyChannels cache key, kind code, width, lag) for
    the rate's box channel set (see channels.py getters)."""
    plan = channel_plan(sample_rate)
    out = {}
    for w in plan["bv"]:
        out[f"bv{w}"] = (("bv", w), 0, w, 0)
    for w in plan["q"]:
        out[f"q{w}"] = (("bq", w), 1, w, 0)
    for lag, box in plan["pb"]:
        out[f"p{lag}x{box}"] = (("bp", lag, box), 2, box, lag)
    return out


# kernel box outputs -> LazyChannels cache keys at the kernel's 10 MS/s
_BOX_KEYS = box_keys(10_000_000)

_FETCH = list(_BOX_KEYS) + ["detect_mask"]


def fetch_names(sample_rate: int) -> tuple:
    """Rate's box channel names + detect_mask (the non-conditioning
    kernel output set)."""
    return tuple(box_keys(sample_rate)) + ("detect_mask",)


_COND_FETCH = ("envelope", "filtered", "deviation", "average", "mod_depth")


_PART_BYTES = 1 << 20  # device->host fetch part size (see fetch_arrays)
_MAX_PARTS = 64
_FETCH_THREADS = 32


@functools.lru_cache(maxsize=4)
def _int_to_f32(shift: int):
    """jitted exact dequant: integer codes -> f32 samples.  Scaling by a
    power of two only changes the exponent (never rounds), so the result
    is bit-identical to the host's read_wav conversion."""
    import jax
    import jax.numpy as jnp

    def conv(x):
        return x.astype(jnp.float32) * jnp.float32(2.0 ** -shift)

    return jax.jit(conv)


def device_put_samples(x: np.ndarray):
    """Upload a [rows, T] f32 sample matrix, shrinking the link bytes when
    the samples sit on an integer grid: 8-bit sources (RTL-SDR capture
    depth) ship as 1-byte codes, 16-bit WAV as 2-byte codes — bit-exact
    either way, because both directions only scale by powers of two."""
    import jax

    # one grid probe serves both depths: x is on the i8 grid exactly when
    # its i16 code is a multiple of 256 (scales are powers of two)
    scaled = x * np.float32(1 << 15)
    if (
        np.array_equal(scaled, np.floor(scaled))
        and scaled.min() >= -(1 << 15)
        and scaled.max() < (1 << 15)
    ):
        codes = scaled.astype(np.int16)
        if not np.any(codes & 0xFF):
            return _int_to_f32(7)(
                jax.device_put((codes >> 8).astype(np.int8))
            )
        return _int_to_f32(15)(jax.device_put(codes))
    return jax.device_put(x)


@functools.lru_cache(maxsize=8)
def _splitter(k: int):
    """jit that splits an array into k equal device-side parts (one
    compiled program per (k, input shape); outputs are separate arrays)."""
    import jax
    import jax.numpy as jnp

    def split(x):
        flat = x.reshape(-1)
        pad = (-flat.size) % k
        if pad:
            flat = jnp.pad(flat, (0, pad))
        rows = flat.reshape(k, -1)
        return tuple(rows[i] for i in range(k))

    return jax.jit(split)


def fetch_arrays(arrays: dict) -> dict[str, np.ndarray]:
    """Transfer a dict of device arrays to host, fast.

    Device->host reads are latency-bound chains of protocol-sized chunks
    and degrade superlinearly with array size (a 16 MB read measures
    ~0.1 MB/s on a remote-attached chip; 32 parallel ~0.5 MB reads measure
    ~19 MB/s).  Each array is split device-side into ~1 MB parts by a
    cached jit (zero-copy outputs), all parts fetch concurrently, and the
    host reassembles.  On PCIe hosts the overlap still wins; small arrays
    skip the split."""
    from concurrent.futures import ThreadPoolExecutor

    plan: dict[str, tuple] = {}
    parts: list = []
    for name, x in arrays.items():
        nbytes = x.size * x.dtype.itemsize
        k = min(_MAX_PARTS, max(1, -(-nbytes // _PART_BYTES)))
        if k == 1:
            plan[name] = (x.shape, x.size, [len(parts)])
            parts.append(x)
            continue
        pieces = _splitter(k)(x)
        plan[name] = (
            x.shape, x.size, list(range(len(parts), len(parts) + k))
        )
        parts.extend(pieces)

    if not parts:
        return {}
    with ThreadPoolExecutor(min(len(parts), _FETCH_THREADS)) as pool:
        host = list(pool.map(np.asarray, parts))

    out = {}
    for name, (shape, size, idxs) in plan.items():
        if len(idxs) == 1:
            out[name] = host[idxs[0]].reshape(shape)
        else:
            flat = np.concatenate([host[i] for i in idxs])
            out[name] = flat[:size].reshape(shape)
    return out


_STAGING = threading.local()


def _staging_buffer(shape: tuple) -> np.ndarray:
    """Per-THREAD staging: the buffer is filled and uploaded after return,
    so a shared cache would let concurrent fused_* callers (farm chunk +
    batch-decode background thread) corrupt each other's in-flight rows.
    Keeps at most one buffer per thread (shapes are bucketed, so churn is
    rare and the largest suite batch is ~130 MB)."""
    cached = getattr(_STAGING, "buf", None)
    if cached is None or cached.shape != shape:
        cached = np.zeros(shape, np.float32)
        _STAGING.buf = cached
    return cached


def _run_batch_blocks(
    captures: list[np.ndarray],
    sample_rate: int,
    power_level_threshold: float,
    L: int,
    H: int,
    fetch: tuple,
    thresholds=None,
    mask_margin: float = 0.0,
) -> list[dict[str, np.ndarray]]:
    """Run MANY captures through the fused TPU frontend in ONE device
    dispatch + ONE (split-pipelined) fetch: every capture's overlap-save
    blocks stack along the kernel's batch axis, so a whole fixture suite
    pays the ~30 ms tunnel latency once instead of per capture, and the
    batch row count buckets to a power of two so repeated batch decodes hit
    the jit/persistent-compile cache.  Returns one channel dict (host
    arrays, len(samples)) per capture.

    mask_margin > 0 loosens the A/F/V SD trigger thresholds by that
    relative amount in the kernel's detect mask ONLY (the fetched channels
    are unchanged).  The mask-only frontend needs this: its triggers come
    from the kernel's f32 running-sum box family while the walk reads host
    f64 boxes, so an unmargined kernel mask could miss a host-side
    threshold crossing by sub-ulp roundoff.  The margin makes the mask a
    conservative superset (extra candidates are always safe — the FSMs
    re-check every condition; B's edge and the power gate read the
    bit-exact conditioning, so they need no margin).

    Block-restart soundness (why this path may NOT feed conditioning
    consumers — use _run_batch_chained there): each block row restarts at
    clock 0 over a zeros halo, so a halo that BEGINS mid-modulation seeds
    the envelope from the modulated level and the freeze rule
    (NfcTech.cpp:42-53) keeps it low for ~100k samples.  Box sums are
    raw-value windows (exact after the halo, restart only changes the
    roundoff family), and an UNDER-estimated envelope only loosens the
    SD/edge trigger comparisons (lower thr*env, lower B edge magnitude).
    The POWER GATE, however, is NOT superset-safe under an under-estimated
    envelope (env < power_thr drops real triggers) — which is why every
    production mask consumer now takes its detect triggers from the
    chained exact-state engine (chained_batch_masks / run_chained_masks)
    and this path serves BOX CHANNELS (and the sharded demonstration
    path, whose caveat is pinned in test_multichip's hazard fixtures)."""
    import jax.numpy as jnp

    from .frontend import _params_tuple
    from .pallas.fused_frontend import LANES, TILE, fused_frontend

    T = H + L
    assert T % TILE == 0
    layouts = []  # (n, nb, row_offset) per capture
    rows = 0
    caps = []
    for samples in captures:
        samples = np.ascontiguousarray(samples, np.float32)
        caps.append(samples)
        n = len(samples)
        nb = max(1, -(-n // L))
        layouts.append((n, nb, rows))
        rows += nb
    # bucket the kernel batch (pad rows are zero and row-independent) so
    # distinct captures/suites reuse a compiled kernel: the kernel needs
    # B % LANES == 0, and the LANES-group count buckets to a power of two
    g = max(1, -(-rows // LANES))
    gb = 1
    while gb < g:
        gb *= 2
    B = gb * LANES
    # persistent staging buffer: a fresh 100+ MB numpy allocation uploads
    # fault-bound (~50 MB/s on this host) while warm pages stream at
    # ~1.6 GB/s; reuse one buffer per shape
    x = _staging_buffer((B, T))
    x[:] = 0.0
    for samples, (n, nb, ro) in zip(caps, layouts):
        for i in range(nb):
            if i == 0:
                seg = samples[: T]
                x[ro, : len(seg)] = seg
            else:
                s = i * L - H
                seg = samples[s : i * L + L]
                x[ro + i, : len(seg)] = seg

    from ..core.thresholds import DecoderThresholds

    mask_params = (thresholds or DecoderThresholds()).detect_mask_tuple(
        power_level_threshold
    )
    if mask_margin:
        p, a, b_deep, f, v = mask_params
        m = 1.0 - mask_margin
        mask_params = (p, a * m, b_deep, f * m, v * m)
    params = SignalParams(
        sample_rate, power_level_threshold=power_level_threshold
    )
    # select= trims the HBM output set to the channels this path consumes
    # (the kernel is write-bound, so skipping the 5 conditioning outputs is
    # a direct rate win); excluded MASK_DEPS stay in VMEM for the detect
    # phase and values are bit-identical to the full run.
    # Explicit device_put: the implicit host->device transfer inside the
    # jit call runs ~30x slower than the direct path on the tunnel-attached
    # chip (measured 0.05 GB/s vs 1.6 GB/s), so never hand numpy to jit.
    # i16-grid inputs ship as 2-byte codes (device_put_samples, bit-exact).
    x = device_put_samples(x)
    res = fused_frontend(
        x, _params_tuple(params), native_layout=False,
        mask_params=mask_params, select=tuple(fetch),
        sample_rate=sample_rate,
    )

    # slice away the dead padding blocks before fetching, but bucket the
    # live-block count to a power of two so distinct captures reuse the
    # same compiled slice/split programs (each new shape costs a multi-
    # minute remote compile on first sight; the extra fetched rows ride
    # the pipelined transfer for ~free)
    nb_b = 8
    while nb_b < rows:
        nb_b *= 2
    nb_b = min(nb_b, B)
    # detect_mask is already native uint8 from the kernel (OUTPUT_DTYPES):
    # 1 byte/sample over the link with no device-side cast pass
    fetched = fetch_arrays({name: res[name][:nb_b] for name in fetch})

    outs: list[dict[str, np.ndarray]] = []
    for n, nb, ro in layouts:
        out: dict[str, np.ndarray] = {}
        for name, dev in fetched.items():
            arr = np.empty(n, dev.dtype)
            for i in range(nb):
                body_off = 0 if i == 0 else H
                lo = i * L
                hi = min(lo + L, n)
                arr[lo:hi] = dev[ro + i, body_off : body_off + (hi - lo)]
            out[name] = arr
        outs.append(out)
    return outs


# --------------------------------------------------------------------------
# Chained mask engine: one jit dispatch runs K consecutive chunks through
# the fused kernel with carried ring state (EXACT conditioning — the power
# gate in the detect mask reads the true streaming envelope, closing the
# frozen-envelope hole of the overlap-save block layout), then compacts the
# packed detect mask ON DEVICE to (indices, bits, count) so the host fetch
# is O(cap) instead of O(samples).  The ~30 ms dispatch floor amortizes
# over the K chunks (bench.py proves the scheme at K=256).

CHAIN_CHUNK = 1 << 16


@functools.lru_cache(maxsize=64)
def _chained_mask_jit(pt, mp, K: int, chunk: int, n_live: int, base0: int,
                      cap: int, sample_rate: int = 10_000_000):
    """jit: (x[n_live, K*chunk] f32, state) ->
    (mask[n_live, K*chunk] u8  [device-resident overflow fallback],
     idx[n_live, cap] i32 (-1 padded, first `cap` trigger positions),
     bits[n_live, cap] u8, count[n_live] i32, state_out).

    base0 is static: the farm's int32 clock fold keeps it in {0, 512}
    (dispatch sizes are multiples of 512), so at most two compiled
    variants exist per shape."""
    import jax
    import jax.numpy as jnp

    from .pallas.fused_frontend import LANES, fused_frontend

    T = K * chunk

    def run(x, state):
        st = state
        pen = state
        rows = []
        for k in range(K):
            # device-side zero-pad of the real stream rows up to the
            # kernel's 1024-lane tile floor (uploading padding was the
            # round-4 farm bottleneck)
            xp = jnp.zeros((LANES, chunk), jnp.float32).at[:n_live].set(
                x[:, k * chunk : (k + 1) * chunk]
            )
            if k == K - 1:
                pen = st  # state at dispatch end minus one chunk
            res, st = fused_frontend(
                xp, pt, native_layout=False, mask_params=mp,
                state=st, base=base0 + k * chunk, return_state=True,
                select=("detect_mask",), sample_rate=sample_rate,
            )
            rows.append(res["detect_mask"][:n_live])
        mm = jnp.concatenate(rows, axis=1)  # [n_live, T] u8

        def one(row):
            idx = jnp.nonzero(row, size=cap, fill_value=-1)[0].astype(
                jnp.int32
            )
            bits = jnp.where(
                idx >= 0, row[jnp.clip(idx, 0, T - 1)], 0
            ).astype(jnp.uint8)
            cnt = jnp.sum((row != 0).astype(jnp.int32))
            return idx, bits, cnt

        idx, bits, cnt = jax.vmap(one)(mm)
        # per-stream full-state rows at end and end-minus-one-chunk: the
        # segmented engine's carry handoff (tiny — [n_live, nstate])
        pen_rows = _state_rows(pen, n_live)
        end_rows = _state_rows(st, n_live)
        return mm, idx, bits, cnt, st, pen_rows, end_rows

    return jax.jit(run)


def _state_rows(state, n_live: int, stride: int = 1, first: int = 0):
    """Extract full per-lane state columns as [n_live, nstate] rows (lanes
    ``first + i*stride`` — the input-row order of fused_frontend's (sub,
    128) tiling, which reshape preserves)."""
    import jax.numpy as jnp

    nstate = state.shape[1]
    flat = state[0].reshape(nstate, -1)  # (nstate, LANES)
    lanes = first + stride * jnp.arange(n_live)
    return flat[:, lanes].T  # [n_live, nstate]


@functools.lru_cache(maxsize=8)
def _expand_state(nstate: int, sub: int = 8):
    """jit: [n, nstate] per-stream state rows -> (1, nstate, sub, 128)
    kernel state with stream i at lane i (the chained engines' layout)."""
    import jax
    import jax.numpy as jnp

    def expand(rows):
        n = rows.shape[0]
        full = jnp.zeros((sub * 128, nstate), jnp.float32)
        full = full.at[jnp.arange(n)].set(rows)
        return full.T.reshape(1, nstate, sub, 128)

    return jax.jit(expand)


def chain_state0(n_groups: int = 1, sub: int = 8,
                 sample_rate: int = 10_000_000):
    """Fresh carried kernel state for a chained stream batch (the state
    extent is rate-parametric — kernel_plan(sample_rate).nstate)."""
    import jax.numpy as jnp

    from .pallas.fused_frontend import kernel_plan

    return jnp.zeros(
        (n_groups, kernel_plan(sample_rate).nstate, sub, 128), jnp.float32
    )


def chained_mask_params(power_level_threshold: float, thresholds=None):
    """Margined kernel mask params for the chained engine: SD thresholds
    carry MASK_ONLY_MARGIN (kernel f32 boxes vs host f64 walk re-check);
    the power gate needs NO margin here — chained conditioning is the
    exact streaming envelope (bit-exact on TPU vs the host oracle)."""
    from ..core.thresholds import DecoderThresholds

    p, a, b_deep, f, v = (
        thresholds or DecoderThresholds()
    ).detect_mask_tuple(power_level_threshold)
    m = 1.0 - MASK_ONLY_MARGIN
    return (p, a * m, b_deep, f * m, v * m)


def run_chained_masks(blocks: np.ndarray, state, base0: int, pt, mp,
                      cap_div: int = 16, chunk: int = CHAIN_CHUNK,
                      sample_rate: int = 10_000_000, want_carry: bool = False):
    """One chained-K dispatch + compacted fetch over device-put rows.

    blocks: [n_live, T] f32 host samples, T % chunk == 0.  Returns
    (per-stream list of (rel_idx i64, bits u8), state_out).  Streams whose
    trigger count overflows the compaction cap fall back to fetching that
    stream's dense mask row (device-resident).

    want_carry=True additionally returns {"pen", "end"}: host
    [n_live, nstate] full-state rows at the dispatch end minus one chunk /
    at the end — the segmented engine's carry handoff
    (run_segmented_masks)."""
    n_live, T = blocks.shape
    assert T % chunk == 0
    K = T // chunk
    cap = max(4096, T // cap_div)
    fn = _chained_mask_jit(pt, mp, K, chunk, n_live, base0, cap,
                           sample_rate)
    x = device_put_samples(blocks)
    mm, idx, bits, cnt, state, pen_rows, end_rows = fn(x, state)
    # two-phase fetch: the tiny count vector first (it also serves as the
    # dispatch-completion sync), then only what each row needs — the
    # compacted arrays for sparse rows, the dense mask row (1 B/sample,
    # through the split-pipelined fetch_arrays path — a bare multi-MB
    # np.asarray measures ~1 MB/s on a tunnel attachment) for rows whose
    # trigger count overflows the cap
    small = {"cnt": cnt}
    if want_carry:
        small["pen"] = pen_rows
        small["end"] = end_rows
    small_h = fetch_arrays(small)
    cnt_h = small_h["cnt"]
    over = [i for i in range(n_live) if int(cnt_h[i]) > cap]
    want = {}
    if len(over) < n_live:
        want["idx"] = idx
        want["bits"] = bits
    for i in over:
        want[i] = mm[i]
    fetched = fetch_arrays(want)
    out = []
    for i in range(n_live):
        if i in fetched:
            row = fetched[i]
            rel = np.flatnonzero(row).astype(np.int64)
            out.append((rel, row[rel]))
        else:
            c = int(cnt_h[i])
            rel = fetched["idx"][i][:c].astype(np.int64)
            out.append((rel, fetched["bits"][i][:c]))
    if want_carry:
        return out, state, {"pen": small_h["pen"], "end": small_h["end"]}
    return out, state


# ---------------------------------------------------------------------------
# Segmented speculative-lane engine: the chained engine's device stage is
# serial in the window length (K chunks through one lane per stream), so a
# small-stream-count farm uses a handful of the kernel's 1024 lanes and the
# dispatch wall time is the FULL window's serial step count.  This engine
# splits each stream's window into S segments that ride S parallel lanes —
# device wall time drops to (K/S + 1) chunks — using the host conditioner's
# proven halo + verify + repair scheme (dsp/conditioner.py, SURVEY §7.2) on
# the kernel's carried state:
#
# - lane (i, 0) continues stream i's EXACT chain: its incoming state is the
#   previous window's state at (end - chunk) and its halo chunk REPLAYS the
#   previous window's last chunk (same samples, congruent ring phases), so
#   its post-halo state is bit-identical to the previous end state;
# - lanes (i, s>0) are SPECULATIVE: canonical warm-up seed (env/avg = first
#   halo sample, w1 = 10x — the conditioner's init) over a one-chunk halo of
#   the real preceding samples;
# - verify: a segment is accepted iff its post-halo conditioning carry
#   (env, w1, mdev, avg, pulse — the rows that determine every downstream
#   value) equals its predecessor's end carry BIT-EXACTLY.  Ring buffers,
#   histories and their phases are exact by construction after the halo
#   (every extent <= 601 samples << the 65536-sample halo, and all segment
#   offsets are congruent mod the fold modulus); the running box sums carry
#   a fresh f32 accumulation of the same windows — the SAME roundoff family
#   as the production chain vs the host f64 walk, covered by
#   MASK_ONLY_MARGIN (the wrong early-halo contributions are ring-stored
#   and subtracted back out bit-identically when they leave the window);
# - repair: the first unverified segment onward re-runs through the EXACT
#   chained engine (pow2 chunk buckets so no new jit shapes) from the
#   accepted predecessor's full end state — worst case one serial window,
#   i.e. the pre-segmentation behavior.
#
# The mask soundness structure is unchanged: the power gate reads an
# envelope that is bit-exactly the true streaming envelope on every
# accepted segment, and SD triggers keep MASK_ONLY_MARGIN.

_NVER = 5  # verified carry rows: env, w1, mdev, avg, pulse-count


@functools.lru_cache(maxsize=32)
def _segmented_mask_jit(pt, mp, S: int, B: int, chunk: int, n_live: int,
                        base: int, cap: int, sample_rate: int):
    """jit: (x[n_live, S*B*chunk], tail[n_live, chunk],
    carry_in[n_live, nstate]) -> (mask[n_lanes, B*chunk] u8 device-resident,
    idx[n_lanes, cap] i32, bits[n_lanes, cap] u8, cnt[n_lanes] i32,
    ver_halo[n_lanes, _NVER], ver_end[n_lanes, _NVER],
    pen[n_live, nstate], end[n_live, nstate], end_all[n_lanes, nstate]).

    Lane (i, s) = row i*S + s covers body samples [s*B*chunk, (s+1)*B*chunk)
    of stream i after one halo chunk; `base` is the rate's fold modulus
    (all segment offsets are multiples of it, so one static base serves
    every lane and chunk with identical ring phases)."""
    import jax
    import jax.numpy as jnp

    from .pallas.fused_frontend import LANES, fused_frontend, kernel_plan

    plan = kernel_plan(sample_rate)
    nstate = plan.nstate
    n_lanes = n_live * S
    assert n_lanes <= LANES
    T_lane = B * chunk

    def ver_rows(st):
        return st[0, :_NVER].reshape(_NVER, LANES)[:, :n_lanes].T

    def run(x, tail, carry_in):
        chunks_x = x.reshape(n_live, S * B, chunk)
        # halo chunk per lane: the previous window's tail for s=0, the
        # preceding segment's last chunk for s>0 (device-side slices — the
        # halo costs no extra upload)
        prev = jnp.concatenate(
            [tail[:, None, :], chunks_x[:, B - 1 :: B][:, : S - 1]], axis=1
        )  # [n_live, S, chunk]

        # initial state: speculative lanes get the conditioner's canonical
        # warm-up seed from their halo's first sample; lanes (i, 0) get the
        # carried end-minus-one-chunk state (full nstate rows)
        heads = jnp.zeros((LANES,), jnp.float32).at[:n_lanes].set(
            prev[:, :, 0].reshape(n_lanes)
        ).reshape(8, 128)
        spec = jnp.zeros((nstate, 8, 128), jnp.float32)
        spec = spec.at[0].set(heads)                     # env
        spec = spec.at[1].set(jnp.float32(10.0) * heads)  # w1 steady state
        spec = spec.at[3].set(heads)                     # avg
        exact = jnp.zeros((LANES, nstate), jnp.float32).at[
            jnp.arange(n_live) * S
        ].set(carry_in).T.reshape(nstate, 8, 128)
        sel = jnp.zeros((LANES,), bool).at[
            jnp.arange(n_live) * S
        ].set(True).reshape(8, 128)
        st = jnp.where(sel[None], exact, spec)[None]  # (1, nstate, 8, 128)

        rows = []
        ver_halo = pen = None
        for k in range(B + 1):
            xk = prev if k == 0 else chunks_x[:, k - 1 :: B]
            xp = jnp.zeros((LANES, chunk), jnp.float32).at[:n_lanes].set(
                xk.reshape(n_lanes, chunk)
            )
            if k == B:
                pen = st  # state at window end minus one chunk
            res, st = fused_frontend(
                xp, pt, native_layout=False, mask_params=mp,
                state=st, base=base, return_state=True,
                select=("detect_mask",), sample_rate=sample_rate,
            )
            if k == 0:
                ver_halo = ver_rows(st)
            else:
                rows.append(res["detect_mask"][:n_lanes])
        mm = jnp.concatenate(rows, axis=1)  # [n_lanes, B*chunk] u8

        def one(row):
            idx = jnp.nonzero(row, size=cap, fill_value=-1)[0].astype(
                jnp.int32
            )
            bits = jnp.where(
                idx >= 0, row[jnp.clip(idx, 0, T_lane - 1)], 0
            ).astype(jnp.uint8)
            return idx, bits, jnp.sum((row != 0).astype(jnp.int32))

        idx, bits, cnt = jax.vmap(one)(mm)
        return (
            mm, idx, bits, cnt, ver_halo, ver_rows(st),
            _state_rows(pen, n_live, stride=S, first=S - 1),
            _state_rows(st, n_live, stride=S, first=S - 1),
            _state_rows(st, n_lanes),
        )

    return jax.jit(run)


def run_segmented_masks(blocks: np.ndarray, carry: dict, pt, mp,
                        segments: int, cap_div: int = 16,
                        chunk: int = CHAIN_CHUNK,
                        sample_rate: int = 10_000_000,
                        k_bucket: int = 32):
    """Segment-parallel chained masks over one window (see the scheme note
    above).  blocks: [n_live, T], T = K*chunk, segments | K;
    carry: {"pen": [n_live, nstate] state at prev end - chunk,
    "end": same at prev end, "tail": [n_live, chunk] prev last chunk}.
    Returns (per-stream (rel i64, bits u8) window-relative, new carry,
    {"repaired_streams", "repair_chunks"})."""
    import jax

    from .pallas.fused_frontend import kernel_plan

    n_live, T = blocks.shape
    S = segments
    assert T % chunk == 0
    K = T // chunk
    assert S >= 2 and K % S == 0
    B = K // S
    plan = kernel_plan(sample_rate)
    base = plan.fold_modulus
    cap = max(4096, (B * chunk) // cap_div)
    fn = _segmented_mask_jit(pt, mp, S, B, chunk, n_live, base, cap,
                             sample_rate)
    x = device_put_samples(blocks)
    tail_dev = device_put_samples(np.ascontiguousarray(carry["tail"]))
    mm, idx, bits, cnt, vh, ve, pen_keep, end_keep, end_all = fn(
        x, tail_dev, jax.device_put(np.ascontiguousarray(carry["pen"]))
    )
    small = fetch_arrays({"cnt": cnt, "vh": vh, "ve": ve,
                          "pen": pen_keep, "end": end_keep})
    cnt_h = small["cnt"]

    # verify EVERY pairwise boundary (NaN compares unequal, which
    # correctly forces a repair): ok[i][s] means lane (i, s)'s post-halo
    # carry equals lane (i, s-1)'s end carry, i.e. segment s is exact
    # WHENEVER its predecessor is
    boundary_ok = np.ones((n_live, S), bool)
    for i in range(n_live):
        for s in range(1, S):
            l = i * S + s
            boundary_ok[i, s] = np.array_equal(
                small["vh"][l], small["ve"][l - 1]
            )
    first_bad: dict[int, int] = {
        i: int(np.argmin(boundary_ok[i]))
        for i in range(n_live)
        if not boundary_ok[i].all()
    }

    # fetch compacted triggers + dense rows for lanes whose trigger count
    # overflowed the compaction cap (the full-cap idx/bits arrays cover
    # every lane already; overflow rows inside a repair range get
    # overwritten, but fetching them is cheaper than a second round trip
    # when the repair early-stops and re-accepts them)
    want = {"idx": idx, "bits": bits}
    over = [l for l in range(n_live * S) if int(cnt_h[l]) > cap]
    for l in over:
        want[l] = mm[l]
    fetched = fetch_arrays(want)

    # repair with convergence stop (the conditioner's scheme): re-run the
    # first unverified segment exactly from the accepted predecessor's
    # full end state, then compare the repaired end carry against the
    # NEXT speculative lane's post-halo carry — a match means that lane
    # (and everything after it, already verified pairwise) is exact, so
    # the remaining speculative results are accepted as-is.  Divergence
    # that persists escalates the repair span by powers of two, so a
    # pause spanning many segments costs O(log S) dispatches, while the
    # common localized case (a frame near one boundary) costs one.
    rep_seg: dict[tuple, tuple] = {}   # (i, s) -> (rel within seg, bits)
    rep_carry: dict[int, tuple] = {}
    repair_chunks = 0
    max_take = max(1, k_bucket // B)
    if first_bad:
        end_all_h = fetch_arrays({"ea": end_all})["ea"]
        expand = _expand_state(plan.nstate)
        for i in first_bad:
            bad = np.flatnonzero(~boundary_ok[i])
            j = 0
            while j < len(bad):
                s = int(bad[j])
                # the predecessor lane is exact here: either it verified
                # pairwise back to an exact ancestor, or an earlier repair
                # rejoined the speculative chain before it
                state_dev = expand(end_all_h[i * S + s - 1][None])
                step = 1
                rejoined = None
                while s < S:
                    take = min(step, S - s, max_take)
                    while take & (take - 1):  # pow2 chunk buckets only
                        take -= take & -take
                    lo_c = s * B
                    kk = take * B
                    seg = blocks[
                        i : i + 1, lo_c * chunk : (lo_c + kk) * chunk
                    ]
                    per, state_dev, c2 = run_chained_masks(
                        seg, state_dev, base, pt, mp, cap_div=cap_div,
                        chunk=chunk, sample_rate=sample_rate,
                        want_carry=True,
                    )
                    rel, bb = per[0]
                    for ss in range(s, s + take):
                        in_seg = (rel >= (ss - s) * B * chunk) & (
                            rel < (ss - s + 1) * B * chunk
                        )
                        rep_seg[(i, ss)] = (
                            rel[in_seg] - (ss - s) * B * chunk, bb[in_seg]
                        )
                    repair_chunks += kk
                    s += take
                    if s >= S:
                        rep_carry[i] = (c2["pen"][0], c2["end"][0])
                        break
                    if np.array_equal(c2["end"][0][:_NVER],
                                      small["vh"][i * S + s]):
                        rejoined = s  # speculative chain is exact again
                        break
                    step *= 2
                if rejoined is None:
                    break  # repaired through the window end
                while j < len(bad) and bad[j] <= rejoined:
                    j += 1

    new_pen = np.array(small["pen"], copy=True)
    new_end = np.array(small["end"], copy=True)
    out = []
    for i in range(n_live):
        parts_r, parts_b = [], []
        for s in range(S):
            if (i, s) in rep_seg:
                rel, bb = rep_seg[(i, s)]
            else:
                l = i * S + s
                if l in fetched:
                    row = fetched[l]
                    rel = np.flatnonzero(row).astype(np.int64)
                    bb = row[rel]
                else:
                    c = int(cnt_h[l])
                    rel = fetched["idx"][l][:c].astype(np.int64)
                    bb = fetched["bits"][l][:c]
            parts_r.append(rel + s * B * chunk)
            parts_b.append(bb)
        if i in rep_carry:
            new_pen[i], new_end[i] = rep_carry[i]
        out.append((
            np.concatenate(parts_r) if parts_r else np.empty(0, np.int64),
            np.concatenate(parts_b) if parts_b else np.empty(0, np.uint8),
        ))
    new_carry = {
        "pen": new_pen, "end": new_end,
        "tail": np.ascontiguousarray(blocks[:, -chunk:]),
    }
    stats = {"repaired_streams": len(first_bad),
             "repair_chunks": repair_chunks}
    return out, new_carry, stats


def chained_batch_masks(
    captures: list[np.ndarray],
    sample_rate: int,
    power_level_threshold: float = 0.01,
    thresholds=None,
    k_chunks: int = 32,
) -> list[dict]:
    """SPARSE detect triggers for many captures via the chained
    exact-state engine: captures ride the kernel as independent lanes
    through K-chunk windows with carried ring state, the packed mask is
    compacted on device, and each capture gets
    {"detect_idx": i64 positions, "detect_bits": u8, "n": length}.

    This replaces the overlap-save block mask layout for the mask-only
    frontends: chained conditioning is the EXACT streaming envelope, so
    the mask's power gate is sound (the block layout's zeros-halo restart
    can freeze the kernel envelope below the power threshold and drop
    real triggers — advisor finding); the SD thresholds keep
    MASK_ONLY_MARGIN for the kernel-f32 vs host-f64 box roundoff."""
    from .frontend import _params_tuple
    from .pallas.fused_frontend import LANES

    from .pallas.fused_frontend import kernel_plan

    # captures sorted by length (desc) so finished ones form a suffix:
    # each window uploads only the LIVE prefix (bucketed to a power of
    # two for jit-cache reuse) — zero-padded tails otherwise dominated
    # the upload bytes for mixed-length suites
    order = sorted(range(len(captures)), key=lambda i: -len(captures[i]))
    caps = [np.ascontiguousarray(captures[i], np.float32) for i in order]
    assert len(caps) <= LANES
    params = SignalParams(
        sample_rate, power_level_threshold=power_level_threshold
    )
    pt = _params_tuple(params)
    mp = chained_mask_params(power_level_threshold, thresholds)
    t_max = len(caps[0])
    state = chain_state0(sample_rate=sample_rate)
    mod = kernel_plan(sample_rate).fold_modulus
    idx_parts: list[list] = [[] for _ in caps]
    bit_parts: list[list] = [[] for _ in caps]
    lo = 0
    while lo < t_max:
        # window width: k_chunks full chunks, final window bucketed to a
        # power of two so the compile set stays {1,2,4,...,k_chunks}
        rem = -(-(t_max - lo) // CHAIN_CHUNK)
        k = min(k_chunks, rem)
        if k & (k - 1):
            k2 = 1
            while k2 < k:
                k2 *= 2
            k = min(k2, k_chunks)
        width = k * CHAIN_CHUNK
        live = sum(1 for c in caps if len(c) > lo)
        live_b = 1
        while live_b < live:
            live_b *= 2
        live_b = min(live_b, len(caps))
        batch = np.zeros((live_b, width), np.float32)
        for i in range(live):
            seg = caps[i][lo : lo + width]
            batch[i, : len(seg)] = seg
        # int32-safe clock fold: every ring size divides the plan's fold
        # modulus and lo is a multiple of CHAIN_CHUNK (>= any ring size),
        # so the folded base is exactly `mod` after the first window —
        # one static compile variant per rate (and mod >= 512 > etu keeps
        # the stream-head envelope seeding off).  Dropping finished lanes
        # from the upload is state-consistent: the device-side pad feeds
        # them the same zeros their tails held.
        base0 = 0 if lo == 0 else mod + lo % mod
        per, state = run_chained_masks(batch, state, base0, pt, mp,
                                       sample_rate=sample_rate)
        for i in range(live):
            rel, bits = per[i]
            keep = rel + lo < len(caps[i])
            idx_parts[i].append(rel[keep] + lo)
            bit_parts[i].append(bits[keep])
        lo += width
    sorted_out = [
        {
            "detect_idx": (
                np.concatenate(ip) if ip else np.empty(0, np.int64)
            ),
            "detect_bits": (
                np.concatenate(bp) if bp else np.empty(0, np.uint8)
            ),
            "n": len(c),
        }
        for ip, bp, c in zip(idx_parts, bit_parts, caps)
    ]
    out: list = [None] * len(captures)
    for pos, i in enumerate(order):
        out[i] = sorted_out[pos]
    return out


@functools.lru_cache(maxsize=8)
def _chain_row_padder(b: int):
    """jitted zero-pad of [n, t] rows up to the kernel lane batch b."""
    import jax
    import jax.numpy as jnp

    def pad(x):
        return jnp.zeros((b, x.shape[1]), x.dtype).at[: x.shape[0]].set(x)

    return jax.jit(pad)


def _run_batch_chained(
    captures: list[np.ndarray],
    sample_rate: int,
    power_level_threshold: float,
    fetch: tuple,
    thresholds=None,
    chunk: int = 1 << 16,
) -> list[dict[str, np.ndarray]]:
    """EXACT device frontend: captures ride the kernel as independent lanes
    through chained chunks with carried ring state — outputs bit-identical
    to a monolithic per-capture pass (the TPU stream farm's scheme,
    fused_frontend.py state contract).

    This is the required path whenever KERNEL CONDITIONING is consumed:
    the overlap-save block path (_run_batch_blocks) seeds each block from
    a zeros halo, and the envelope FREEZES during deep modulation
    (NfcTech.cpp:42-53 update=false), so no halo length can reconstruct a
    frozen envelope across a block boundary that lands mid-frame.  Box
    sums and margined detect triggers tolerate block restarts (raw-value
    windows + conservative margins), so the mask paths keep the one-
    dispatch block layout.

    Captures are sorted by length (desc) so finished lanes form a suffix:
    each chunk uploads and fetches only the live prefix."""
    from ..core.params import SignalParams
    from ..core.thresholds import DecoderThresholds
    from .frontend import _params_tuple
    from .pallas.fused_frontend import LANES, TILE, fused_frontend

    assert chunk % TILE == 0
    order = sorted(range(len(captures)), key=lambda i: -len(captures[i]))
    caps = [np.asarray(captures[i], np.float32) for i in order]
    lens = [len(c) for c in caps]
    t_max = lens[0]
    assert t_max < 2 ** 31, "capture exceeds the kernel's int32 clock"
    n_chunks = -(-t_max // chunk)

    b_pad = LANES
    while b_pad < len(caps):
        b_pad *= 2

    params = SignalParams(
        sample_rate, power_level_threshold=power_level_threshold
    )
    mask_params = (thresholds or DecoderThresholds()).detect_mask_tuple(
        power_level_threshold
    )
    pt = _params_tuple(params)

    outs = [
        {
            name: np.empty(
                n, np.uint8 if name == "detect_mask" else np.float32
            )
            for name in fetch
        }
        for n in lens
    ]
    state = None
    for k in range(n_chunks):
        lo = k * chunk
        live = sum(1 for n in lens if n > lo)
        block = np.zeros((live, chunk), np.float32)
        for i in range(live):
            seg = caps[i][lo : lo + chunk]
            block[i, : len(seg)] = seg
        x = device_put_samples(block)
        if b_pad != live:
            x = _chain_row_padder(b_pad)(x)
        res, state = fused_frontend(
            x, pt, native_layout=False, mask_params=mask_params,
            state=state, base=lo, return_state=True, select=tuple(fetch),
            sample_rate=sample_rate,
        )
        fetched = fetch_arrays({name: res[name][:live] for name in fetch})
        for i in range(live):
            hi = min(lens[i], lo + chunk)
            for name in fetch:
                outs[i][name][lo:hi] = fetched[name][i, : hi - lo]

    inv = [0] * len(captures)
    for pos, i in enumerate(order):
        inv[i] = pos
    return [outs[inv[i]] for i in range(len(captures))]


def _run_capture_blocks(
    samples: np.ndarray,
    sample_rate: int,
    power_level_threshold: float,
    L: int,
    H: int,
    fetch: tuple,
    thresholds=None,
) -> dict[str, np.ndarray]:
    """Run one capture through the fused TPU frontend as overlap-save blocks;
    returns host f32 arrays (len(samples)) for the requested channels."""
    return _run_batch_blocks(
        [samples], sample_rate, power_level_threshold, L, H, fetch,
        thresholds=thresholds,
    )[0]


def fused_capture_channels(
    samples: np.ndarray,
    sample_rate: int,
    power_level_threshold: float = 0.01,
    L: int = DEFAULT_L,
    H: int = DEFAULT_H,
    thresholds=None,
) -> dict[str, np.ndarray]:
    """Box channels + packed detect_mask for one capture (device compute;
    conditioning stays host-side — see fused_capture_all for the full
    device frontend)."""
    return _run_capture_blocks(
        samples, sample_rate, power_level_threshold, L, H,
        fetch_names(sample_rate),
        thresholds=thresholds,
    )


def fused_capture_all(
    samples: np.ndarray,
    sample_rate: int,
    power_level_threshold: float = 0.01,
    L: int = DEFAULT_L,
    H: int = DEFAULT_H,
    thresholds=None,
):
    """Full device frontend for one capture: (Conditioned, channels).

    The host conditioner is ~80% of single-capture decode wall time (the
    serial per-sample C++ chain runs at ~3.5 MS/s/core); here conditioning
    comes from the same fused kernel pass that produces the box channels,
    and only the carrier-edge peak tracker (which the kernel does not emit)
    runs on the host — the carried-state chained scheme the TPU stream farm
    uses (bit-identical to a monolithic pass; overlap-save blocks are NOT
    sound for conditioning, see _run_batch_chained), golden-validated by
    validate_tpu_farm/validate_tpu_decode."""
    from ..core.params import SignalParams
    from ..native.binding import Conditioned, edge_track_into

    arrs = _run_batch_chained(
        [samples], sample_rate, power_level_threshold,
        fetch_names(sample_rate) + _COND_FETCH, thresholds=thresholds,
    )[0]
    n = len(samples)
    params = SignalParams(
        sample_rate, power_level_threshold=power_level_threshold
    )
    bufs = {
        "value": np.ascontiguousarray(samples, np.float32),
        **{k: arrs[k] for k in _COND_FETCH},
        "edge_peak": np.empty(n, np.float32),
        "edge_time": np.empty(n, np.uint32),
    }
    state = np.zeros(2, np.float64)
    edge_track_into(params, state, bufs, 0, n, 0)
    cond = Conditioned(
        bufs["value"], bufs["envelope"], bufs["filtered"], bufs["deviation"],
        bufs["average"], bufs["mod_depth"], bufs["edge_peak"],
        bufs["edge_time"],
    )
    return cond, {k: arrs[k] for k in fetch_names(sample_rate)}


def fused_batch_channels(
    captures: list[np.ndarray],
    sample_rate: int,
    power_level_threshold: float = 0.01,
    L: int = DEFAULT_L,
    H: int = DEFAULT_H,
    thresholds=None,
) -> list[dict[str, np.ndarray]]:
    """Box channels + detect triggers for MANY captures; one dict per
    capture.  Box channels ride the one-dispatch overlap-save block layout
    (raw-value windows tolerate block restarts — only the roundoff family
    changes); the detect triggers come from the chained exact-state engine
    in SPARSE form so their power gate reads the true streaming envelope
    (the block layout's frozen-envelope hole — advisor finding).  The SD
    margin covers the chained-f32 vs fetched-block-f32 box roundoff the
    same way it covers f32-vs-host-f64."""
    from concurrent.futures import ThreadPoolExecutor

    # the two device passes are independent until the merge: run the
    # chained trigger pass on a background thread so its device work +
    # fetch overlaps the block pass instead of serializing dispatch floors
    with ThreadPoolExecutor(1) as bg:
        fut = bg.submit(
            chained_batch_masks, captures, sample_rate,
            power_level_threshold, thresholds=thresholds,
        )
        boxes = _run_batch_blocks(
            captures, sample_rate, power_level_threshold, L, H,
            tuple(box_keys(sample_rate)), thresholds=thresholds,
        )
        sparse = fut.result()
    for b, s in zip(boxes, sparse):
        b.update(s)
    return boxes


def fused_capture_masks(
    samples: np.ndarray,
    sample_rate: int,
    power_level_threshold: float = 0.01,
    L: int = DEFAULT_L,
    H: int = DEFAULT_H,
    thresholds=None,
) -> dict:
    """Sparse detect triggers ONLY for one capture — the lightest device
    frontend: O(triggers) over the link, replacing exactly the host's
    trigger-index construction (the dominant non-walk host cost);
    conditioning and box channels build natively on the host.  Runs the
    chained exact-state engine (chained_batch_masks) so the power gate is
    sound; SD thresholds carry MASK_ONLY_MARGIN (conservative superset of
    the host-f64 triggers the walk re-checks).  L/H are accepted for API
    compatibility; the chained layout has no halo."""
    return chained_batch_masks(
        [samples], sample_rate, power_level_threshold,
        thresholds=thresholds,
    )[0]


def fused_batch_masks(
    captures: list[np.ndarray],
    sample_rate: int,
    power_level_threshold: float = 0.01,
    L: int = DEFAULT_L,
    H: int = DEFAULT_H,
    thresholds=None,
) -> list[dict]:
    """Sparse detect triggers for MANY captures (chained exact-state
    engine, one device pass over lane-stacked captures — see
    fused_capture_masks)."""
    return chained_batch_masks(
        captures, sample_rate, power_level_threshold,
        thresholds=thresholds,
    )


def fused_batch_all(
    captures: list[np.ndarray],
    sample_rate: int,
    power_level_threshold: float = 0.01,
    L: int = DEFAULT_L,
    H: int = DEFAULT_H,
    thresholds=None,
) -> list[tuple]:
    """Full device frontend for MANY captures; returns one
    (Conditioned, channels) pair per capture.  Runs the EXACT carried-state
    chained path (_run_batch_chained) — kernel conditioning demands it —
    with captures stacked as kernel lanes, one dispatch + fetch per chunk.
    Only the carrier-edge peak tracker (not emitted by the kernel) runs
    per capture on the host."""
    from ..core.params import SignalParams
    from ..native.binding import Conditioned, edge_track_into

    arr_sets = _run_batch_chained(
        captures, sample_rate, power_level_threshold,
        fetch_names(sample_rate) + _COND_FETCH, thresholds=thresholds,
    )
    params = SignalParams(
        sample_rate, power_level_threshold=power_level_threshold
    )
    outs = []
    for samples, arrs in zip(captures, arr_sets):
        n = len(samples)
        bufs = {
            "value": np.ascontiguousarray(samples, np.float32),
            **{k: arrs[k] for k in _COND_FETCH},
            "edge_peak": np.empty(n, np.float32),
            "edge_time": np.empty(n, np.uint32),
        }
        state = np.zeros(2, np.float64)
        edge_track_into(params, state, bufs, 0, n, 0)
        cond = Conditioned(
            bufs["value"], bufs["envelope"], bufs["filtered"],
            bufs["deviation"], bufs["average"], bufs["mod_depth"],
            bufs["edge_peak"], bufs["edge_time"],
        )
        outs.append((cond, {k: arrs[k] for k in fetch_names(sample_rate)}))
    return outs


def idx_key_map(sample_rate: int, power_level_threshold: float,
                thresholds=None):
    """(mask bit name, cache key, fx descriptor) for every detect-trigger
    index channel the kernel's detect_mask covers, keyed exactly as the
    tech FSMs' bind_channels request them (thresholds come from the single
    source of truth, core.thresholds, and must match the kernel's
    mask_params — both sides consume the same DecoderThresholds)."""
    from ..core.thresholds import DecoderThresholds
    from ..demod.nfcv import nfcv_bitrate

    th = thresholds or DecoderThresholds()
    # the techs key thresholds through f32 (ctx.power_level_threshold is a
    # SignalParams np.float32); the key must round-trip identically or the
    # preloaded entries silently miss and the host recomputes every detect
    # index channel (asserted by test_preload_covers_detect_indices)
    pw = float(np.float32(power_level_threshold))
    out = []
    a_thr = float(np.float32(th.nfca.correlation))
    for r, br in enumerate(nfca_bitrates(sample_rate)):
        d, p1, p2 = br.symbol_delay_detect, br.period1, br.period2
        out.append((
            f"mask_a_{r}",
            ("sdidx", d, p1, p2, a_thr, pw, False),
            ("sd", ("bv", p2), d, p1, p2, a_thr, pw, False),
        ))
    b_deep = float(np.float32(th.nfcb.min_modulation_deep))
    for br, mname in zip(
        nfca_bitrates(sample_rate)[:2], ("mask_b_0", "mask_b_94")
    ):
        d = br.symbol_delay_detect
        out.append((
            mname, ("eidxb", d, b_deep, pw), ("edgeb", d, b_deep, pw)
        ))
    f_thr = float(np.float32(th.nfcf.correlation))
    for br, mname in zip(
        nfca_bitrates(sample_rate)[1:], ("mask_f_1", "mask_f_2")
    ):
        p1, p2 = br.period1, br.period2
        out.append((
            mname,
            ("sdidx", 0, p1, p2, f_thr, pw, False),
            ("sd", ("bv", p2), 0, p1, p2, f_thr, pw, False),
        ))
    v_thr = float(np.float32(th.nfcv.correlation))
    brv = nfcv_bitrate(sample_rate)
    dv, p1v, p2v = brv.symbol_delay_detect, brv.period1, brv.period2
    out.append((
        "mask_v",
        ("sdidx", dv, p1v, p2v, v_thr, pw, True),
        ("sd", ("bv", p2v), dv, p1v, p2v, v_thr, pw, True),
    ))
    return out


def preload_channels(
    channels,
    arrs: dict[str, np.ndarray],
    sample_rate: int,
    power_level_threshold: float,
    thresholds=None,
) -> None:
    """Stuff device-computed channels into a LazyChannels cache so the tech
    FSMs' ``bind_channels`` finds every box channel and detect-index set
    already current (anything not preloaded — carrier crossings, mod-depth
    gates — still computes lazily on the host from the exact conditioning).

    Must run before the techs are created (entries are keyed exactly as the
    techs' getters build them; pass the SAME DecoderThresholds the kernel
    ran with so keys and mask bits agree)."""
    from .pallas.fused_frontend import MASK_LAYOUT

    assert channels.base == 0, "TPU preload is for whole-capture decode"
    sparse = "detect_idx" in arrs
    n = arrs["n"] if sparse else len(arrs["detect_mask"])

    # mask-only sets skip the box preload: the box channels then build
    # natively on the host (cheap; the trigger-index construction the mask
    # replaces is the expensive part).  Box names are rate-parametric
    # (box_keys), so sharded non-10 MS/s channel sets preload too.
    for name, (key, kind_code, width, lag) in box_keys(sample_rate).items():
        if name in arrs:
            channels._cache[key] = {
                "arr": arrs[name],
                "n": n,
                # extension never runs (n is final); a fresh f64 carry
                # would only matter if the stream grew
                "acc": np.zeros(1, np.float64),
                "idx": None,
                "scanned": 0,
                "extend": None,
                "kind": "box",
                "meta": (kind_code, width, lag),
            }

    # detect triggers -> index channels, gated at the 1024-sample warm-up.
    # Dense form: a packed mask byte per sample.  Sparse form (the chained
    # compacted engine): trigger positions + their packed bits.
    if sparse:
        pos = arrs["detect_idx"].astype(np.int64)
        pbits = arrs["detect_bits"].astype(np.int32)
        keep = pos >= _WARMUP
        pos, pbits = pos[keep], pbits[keep]
    else:
        bits = arrs["detect_mask"].astype(np.int32)
        bits[:_WARMUP] = 0
    masks = {name: w for name, w in MASK_LAYOUT}

    for mname, key, fx in idx_key_map(
        sample_rate, power_level_threshold, thresholds=thresholds
    ):
        if sparse:
            idx = np.ascontiguousarray(pos[(pbits & masks[mname]) != 0])
        else:
            idx = np.flatnonzero(bits & masks[mname]).astype(np.int64)
        channels._cache[key] = {
            "arr": None,
            "n": 0,
            "acc": None,
            "idx": idx,
            "idx_n": len(idx),
            "scanned": n,
            "extend": None,
            "kind": "idx",
            "fx": fx,
        }

    channels._plan = None
