"""Block-parallel signal conditioning on TPU (JAX).

The reference conditioning chain (NfcTech.cpp:28-105) is a per-sample scan
with bounded memory:

- conditional exponential envelope (W0=0.95 @10MS/s -> ~600-sample memory
  during carrier; the silence timeout forces an update every 10 ETU)
- 1-pole IIR DC removal (a=0.9 -> ~270-sample memory)
- mean-deviation EMA (W0=0.98 -> ~1.5k samples)
- signal-average EMA (W0=0.995 -> ~6k samples)

Because every recurrence forgets its initial state well within a halo of a few
thousand samples, the stream is split into blocks with a warm-up halo
(overlap-save): each block scans from a canonical guessed state and the halo
region is discarded.  This is the TPU-native formulation of SURVEY.md §5
"long-context": block-parallel scans instead of a single sequential walk.
The scan itself is `jax.lax.scan` over time carrying a [num_blocks] state
vector, so every step is a full-width VPU op.

Block 0 starts from the true initial state (zeros + the `clock < ETU` envelope
seed branch), so its output is exact by construction; interior blocks are
exact once the halo has washed out the guessed state (validated against the
native sequential oracle in tests).
"""

from __future__ import annotations

import functools

import numpy as np

from ..native.binding import Conditioned


def _scan_fn(params_tuple, carry, x):
    import jax
    import jax.numpy as jnp

    (enve_w0, enve_w1, mdev_w0, mdev_w1, mean_w0, mean_w1, iir_a, etu) = params_tuple
    env, w1, mdev, avg, pulse, clock = carry
    v = x

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

    # deviation / average EMAs (NfcTech.cpp:65-68)
    mdev = mdev * mdev_w0 + jnp.abs(filt) * mdev_w1
    avg = avg * mean_w0 + v * mean_w1

    # modulation depth (NfcTech.cpp:74)
    clamped = jnp.maximum(0.0, jnp.minimum(v, new_env))
    mdepth = (new_env - clamped) / new_env

    clock = clock + 1
    return (new_env, w1, mdev, avg, pulse, clock), (new_env, filt, mdev, avg, mdepth)


@functools.partial
def _noop(x):
    return x


def _build_scan(params_tuple):
    import jax

    def run(blocks, init_env, init_w1, init_avg, init_clock):
        import jax.numpy as jnp

        nb = blocks.shape[0]
        carry = (
            init_env,
            init_w1,
            jnp.zeros(nb, jnp.float32),
            init_avg,
            jnp.zeros(nb, jnp.int32),
            init_clock,
        )
        fn = lambda c, x: _scan_fn(params_tuple, c, x)
        _, outs = jax.lax.scan(fn, carry, blocks.T)
        return outs  # each [T, nb]

    return run


_JITTED = {}


def condition_jax(value: np.ndarray, params, block: int = 65536, halo: int = 16384):
    """Run the conditioning chain block-parallel under jit; returns the same
    Conditioned arrays as the native oracle (edge tracker computed on host
    from the filtered array, since its state is a short-memory hysteresis)."""
    import jax
    import jax.numpy as jnp

    n = len(value)
    value = np.ascontiguousarray(value, dtype=np.float32)

    params_tuple = (
        np.float32(params.signal_enve_w0),
        np.float32(params.signal_enve_w1),
        np.float32(params.signal_mdev_w0),
        np.float32(params.signal_mdev_w1),
        np.float32(params.signal_mean_w0),
        np.float32(params.signal_mean_w1),
        np.float32(params.signal_iir_dc_a),
        np.int32(params.elementary_time_unit),
    )

    # block layout: block b spans [b*block, (b+1)*block), scan starts at
    # start-halo (block 0: exact init from sample 0)
    nb = max(1, -(-n // block))
    padded = nb * block
    starts = np.arange(nb) * block
    scan_starts = np.maximum(starts - halo, 0)
    span = block + halo
    # gather [nb, span] windows (right-pad with last value to keep shapes static)
    pad_val = np.pad(value, (0, padded + halo - n), mode="edge")
    idx = scan_starts[:, None] + np.arange(span)[None, :]
    blocks = pad_val[idx]

    # canonical warm-up init per block; block 0 gets the true init
    first = blocks[:, 0]
    init_env = first.copy()
    init_w1 = first * np.float32(10.0)  # steady state of w = v + 0.9 w
    init_avg = first.copy()
    init_clock = scan_starts.astype(np.int32)
    init_env[0] = 0.0
    init_w1[0] = 0.0
    init_avg[0] = 0.0

    key = (params_tuple, nb, span)
    if key not in _JITTED:
        _JITTED[key] = jax.jit(_build_scan(params_tuple))
    outs = _JITTED[key](
        jnp.asarray(blocks),
        jnp.asarray(init_env),
        jnp.asarray(init_w1),
        jnp.asarray(init_avg),
        jnp.asarray(init_clock),
    )
    env_o, filt_o, mdev_o, avg_o, mdepth_o = (np.asarray(o) for o in outs)

    def stitch(arr_t_nb):
        out = np.empty(padded, np.float32)
        for b in range(nb):
            drop = starts[b] - scan_starts[b]
            out[starts[b] : starts[b] + block] = arr_t_nb[drop : drop + block, b]
        return out[:n]

    env = stitch(env_o)
    filt = stitch(filt_o)
    mdev = stitch(mdev_o)
    avg = stitch(avg_o)
    mdepth = stitch(mdepth_o)

    epeak, etime = _edge_tracker(filt, params)
    return Conditioned(value, env, filt, mdev, avg, mdepth, epeak, etime)


def _edge_tracker(filt: np.ndarray, params):
    """Carrier edge peak tracker (NfcTech.cpp:77-92), reconstructed from the
    filtered array: running max of |filtered| with reset at low-threshold
    crossings.  Vectorized as a segmented cummax over reset regions."""
    rect = np.abs(filt)
    high = rect > np.float32(params.signal_high_threshold)
    low = rect < np.float32(params.signal_low_threshold)
    n = len(filt)

    # state machine per sample is: peak = 0 after the last low sample unless a
    # higher high-sample appeared since.  Compute segment ids at low crossings.
    reset_id = np.cumsum(low)  # segment id increments at every low sample
    # candidate values: rect where high else 0
    cand = np.where(high, rect, 0.0).astype(np.float32)
    # running max of cand within each reset segment
    peak = np.empty(n, np.float32)
    time = np.empty(n, np.uint32)
    # vectorized segmented running argmax via np.maximum.accumulate on a keyed
    # transform: process per segment boundaries
    bounds = np.flatnonzero(low)
    prev = 0
    last_peak = 0.0
    last_time = 0
    seg_edges = np.concatenate([bounds, [n]])
    # Iterate only over segments that contain at least one high sample
    run_max = np.maximum.accumulate(cand)
    # fallback scalar walk only over high samples for exact time semantics
    peak_val = 0.0
    peak_t = 0
    hi_idx = np.flatnonzero(high)
    lo_idx = bounds
    peak[:] = 0.0
    time[:] = 0
    # merge walk over high/low events (sparse in practice)
    events = np.union1d(hi_idx, lo_idx)
    cur_peak = 0.0
    cur_time = 0
    prev_e = 0
    for e in events:
        peak[prev_e:e] = cur_peak
        time[prev_e:e] = cur_time
        if high[e]:
            if rect[e] > cur_peak:
                cur_peak = float(rect[e])
                cur_time = int(e)
        else:
            cur_peak = 0.0
        peak[e] = cur_peak
        time[e] = cur_time
        prev_e = e + 1
    peak[prev_e:] = cur_peak
    time[prev_e:] = cur_time
    return peak, time
