"""Block-parallel signal conditioning on TPU (JAX), bit-exact via halo + repair.

The reference conditioning chain (NfcTech.cpp:28-105) is a per-sample scan:

- conditional exponential envelope with silence-timeout reset
- 1-pole IIR DC removal
- mean-deviation and signal-average EMAs

The IIR and both EMAs forget their initial state within a few thousand
samples, so an overlap-save halo makes interior blocks exact.  The envelope
does NOT always converge: in carrier-off stretches it updates only on the
10-ETU timeout, giving it a memory of ~500k samples.  The TPU-native answer
(SURVEY.md §7.2) is speculative block parallelism with verification:

1. pass 1: scan all blocks in parallel, each warmed up over a halo from a
   canonical guessed state (`lax.scan` over time carrying a [num_blocks]
   state vector — every step is a full-width VPU op);
2. verify: a block is exact iff its halo-computed state at the boundary
   sample equals the finalized state of its predecessor (all scan states are
   emitted per sample, so this check is complete — the state at t fully
   determines the future);
3. repair: re-scan only unconverged blocks from the exact predecessor carry.

Block 0 starts from the true initial state, so exactness propagates.  The
result is bit-identical to the sequential C++ oracle (asserted in tests).
"""

from __future__ import annotations

import numpy as np

from ..native.binding import Conditioned


def _scan_fn(params_tuple, carry, v):
    import jax.numpy as jnp

    (enve_w0, enve_w1, mdev_w0, mdev_w1, mean_w0, mean_w1, iir_a, etu) = params_tuple
    env, w1, mdev, avg, pulse, clock = carry

    # conditional envelope (NfcTech.cpp:39-53)
    pulse = pulse + 1
    diff = jnp.abs(v - env) / env
    update = (diff < 0.05) | (pulse > etu * 10)
    seed = (~update) & (clock < etu)
    new_env = jnp.where(update, env * enve_w0 + v * enve_w1, jnp.where(seed, v, env))
    pulse = jnp.where(update, 0, pulse)

    # IIR DC removal (NfcTech.cpp:56-62)
    w0 = v + w1 * iir_a
    filt = w0 - w1
    w1 = w0

    # deviation / average EMAs (NfcTech.cpp:65-68)
    mdev = mdev * mdev_w0 + jnp.abs(filt) * mdev_w1
    avg = avg * mean_w0 + v * mean_w1

    clock = clock + 1
    new_carry = (new_env, w1, mdev, avg, pulse, clock)
    return new_carry, (new_env, w1, mdev, avg, filt, pulse)


def _build_scan(params_tuple, unroll: int = 16):
    """Scan over time carrying [nb]-wide state.  `unroll` samples are
    processed per scan step (sequentially, identical op order — exactness is
    unchanged) to amortize the per-iteration overhead of the XLA while loop,
    which otherwise dominates at ~microseconds per step."""
    import jax
    import jax.numpy as jnp

    def run(blocks, env0, w10, mdev0, avg0, pulse0, clock0):
        nb, t = blocks.shape
        assert t % unroll == 0, f"span {t} not divisible by unroll {unroll}"

        def step(carry, xk):  # xk: [unroll, nb]
            outs = []
            for i in range(unroll):
                carry, out = _scan_fn(params_tuple, carry, xk[i])
                outs.append(out)
            stacked = tuple(
                jnp.stack([o[j] for o in outs]) for j in range(len(outs[0]))
            )
            return carry, stacked

        carry = (env0, w10, mdev0, avg0, pulse0, clock0)
        xs = blocks.T.reshape(t // unroll, unroll, nb)
        _, outs = jax.lax.scan(step, carry, xs)
        # [T/unroll, unroll, nb] -> [T, nb]
        return tuple(o.reshape(t, nb) for o in outs)

    return run


_JITTED: dict = {}


def _scan_jit(params_tuple, nb, span):
    import jax

    key = (params_tuple, nb, span)
    if key not in _JITTED:
        _JITTED[key] = jax.jit(_build_scan(params_tuple))
    return _JITTED[key]


def condition_jax(value: np.ndarray, params, block: int = 65536, halo: int = 16384):
    """Bit-exact block-parallel conditioning; returns the same `Conditioned`
    arrays as the native sequential oracle."""
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

    nb_real = max(1, -(-n // block))
    # bucket the block count to the next power of two so jitted programs are
    # reused across inputs of different lengths (padding scans are discarded)
    nb = 1
    while nb < nb_real:
        nb *= 2
    padded = nb * block
    starts = np.arange(nb) * block
    scan_starts = np.maximum(starts - halo, 0)
    span = block + halo
    pad_val = np.pad(value, (0, padded + halo - n), mode="edge")
    idx = scan_starts[:, None] + np.arange(span)[None, :]
    blocks = pad_val[idx]

    # canonical warm-up init; block 0 gets the true initial state
    first = blocks[:, 0]
    env0 = first.copy()
    w10 = first * np.float32(10.0)  # steady state of w = v + 0.9 w
    mdev0 = np.zeros(nb, np.float32)
    avg0 = first.copy()
    pulse0 = np.zeros(nb, np.int32)
    clock0 = scan_starts.astype(np.int32)
    env0[0] = 0.0
    w10[0] = 0.0
    avg0[0] = 0.0

    run = _scan_jit(params_tuple, nb, span)
    outs = run(
        jnp.asarray(blocks),
        jnp.asarray(env0),
        jnp.asarray(w10),
        jnp.asarray(mdev0),
        jnp.asarray(avg0),
        jnp.asarray(pulse0),
        jnp.asarray(clock0),
    )
    env_o, w1_o, mdev_o, avg_o, filt_o, pulse_o = (np.asarray(o) for o in outs)

    # finalized per-sample outputs (padded length)
    names = ("env", "w1", "mdev", "avg", "filt", "pulse")
    final = {k: np.empty(padded, a.dtype) for k, a in zip(names, (env_o, w1_o, mdev_o, avg_o, filt_o, pulse_o))}

    def commit(b, arrs_t_nb=None, repair_out=None):
        """Write block b's kept region from pass-1 ([T, nb] arrays) or from a
        repair scan output ([T] arrays)."""
        s = starts[b]
        if repair_out is None:
            drop = s - scan_starts[b]
            for k, a in zip(names, arrs_t_nb):
                final[k][s : s + block] = a[drop : drop + block, b]
        else:
            for k, a in zip(names, repair_out):
                final[k][s : s + block] = a

    pass1 = (env_o, w1_o, mdev_o, avg_o, filt_o, pulse_o)
    commit(0, pass1)

    repair_jit = None
    for b in range(1, nb):
        s = starts[b]
        drop = s - scan_starts[b]
        # verify: halo-computed state at boundary sample s-1 vs finalized
        boundary_ok = all(
            np.asarray(a[drop - 1, b]) == final[k][s - 1]
            for k, a in zip(names, pass1)
            if k != "filt"  # filt is derived from w1; w1 check covers it
        )
        if boundary_ok:
            commit(b, pass1)
            continue
        # repair: exact scan of this block from the finalized carry
        if repair_jit is None:
            repair_jit = _scan_jit(params_tuple, 1, block)
        seg = pad_val[s : s + block][None, :]
        outs_r = repair_jit(
            jnp.asarray(seg),
            jnp.asarray(final["env"][s - 1 : s]),
            jnp.asarray(final["w1"][s - 1 : s]),
            jnp.asarray(final["mdev"][s - 1 : s]),
            jnp.asarray(final["avg"][s - 1 : s]),
            jnp.asarray(final["pulse"][s - 1 : s]),
            np.asarray([s], np.int32),
        )
        commit(b, repair_out=[np.asarray(o)[:, 0] for o in outs_r])

    env = final["env"][:n]
    filt = final["filt"][:n]
    mdev = final["mdev"][:n]
    avg = final["avg"][:n]

    # modulation depth on host with strict IEEE ops (NfcTech.cpp:74); the TPU
    # divide is not guaranteed correctly rounded and this field feeds
    # threshold comparisons in the detectors
    with np.errstate(invalid="ignore", divide="ignore"):
        clamped = np.maximum(np.float32(0.0), np.minimum(value, env))
        mdepth = (env - clamped) / env

    epeak, etime = _edge_tracker(filt, params)
    return Conditioned(value, env, filt, mdev, avg, mdepth, epeak, etime)


def _edge_tracker(filt: np.ndarray, params):
    """Carrier edge peak tracker (NfcTech.cpp:77-92), reconstructed from the
    filtered array: running max of |filtered| above the high threshold, reset
    at low-threshold samples.  Walks only the sparse event samples."""
    rect = np.abs(filt)
    high = rect > np.float32(params.signal_high_threshold)
    low = rect < np.float32(params.signal_low_threshold)
    n = len(filt)

    peak = np.zeros(n, np.float32)
    time = np.zeros(n, np.uint32)
    events = np.flatnonzero(high | low)
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
