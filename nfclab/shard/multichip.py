"""Multi-device decode: mesh-sharded channel computation feeding the walk.

This is the production multi-chip path: a capture is cut into ``L``-sample
body blocks laid out across the device mesh (one leading ``blocks`` axis,
data-parallel); each device conditions and correlates its blocks and the
``H``-sample left halo every block needs arrives from its left neighbour
over ICI via ``jax.lax.ppermute`` (shard/temporal.halo_exchange) — blocks
interior to a device take their halo from the neighbouring row locally, so
exactly one halo crosses the interconnect per device per step.

Semantics match the TPU fused-kernel overlap-save path
(dsp/tpu_channels.fused_capture_channels): every (halo + body) window is
processed from zero carry, so body values converge to the continuous-stream
values within the halo (H=8192 covers the conditioning memory + the longest
correlator lookback, 473 + 1024-ring warm-up).  Block 0 is bit-exact with a
fresh stream: its halo is zeros and its conditioning clock/pulse counters
start at ``-H``, so the carry entering sample 0 is exactly the zero state
(the scan over a zero halo leaves env/w1/mdev/avg at 0 and the pulse counter
reaches 0 precisely at clock 0).

Outputs are the decode channel set (the 9 box channels + the packed all-tech
``detect_mask``, same names/bit layout as the fused kernel), ready for
``dsp.tpu_channels.preload_channels`` — so the host event walk consumes
mesh-computed channels and frames stay golden-equal vs the reference's
``wav/*.json`` (test-sdr/main.cpp:200-207 semantics, RawFrame.cpp:82-97
equality).  Validated by tests/test_multichip.py on the virtual 8-device CPU
mesh and by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools

import numpy as np

# body / halo per block; mirrors dsp/tpu_channels DEFAULT_L/DEFAULT_H
DEFAULT_L = 24576
DEFAULT_H = 8192


def _mask_val(env, filt, boxes, power_thr, thr, plan):
    """Packed all-tech detect mask over window arrays [R, W] — the same
    trigger formulas and bit weights as the fused kernel's vectorized
    detect phase (dsp/pallas/fused_frontend.py), expressed as whole-array
    shifts instead of history-buffer slices; rate-parametric via ``plan``
    (dsp.tpu_channels.channel_plan)."""
    import jax.numpy as jnp

    from ..dsp.pallas.fused_frontend import (
        MASK_BIT_V, MASK_BITS_A, MASK_BITS_B, MASK_BITS_F,
    )

    w_len = env.shape[-1]

    def shift(a, d):
        if d == 0:
            return a
        return jnp.pad(a[:, : w_len - d], ((0, 0), (d, 0)))

    power_ok = env >= jnp.float32(power_thr)
    mval = jnp.zeros_like(env)

    min_corr_a = jnp.float32(thr["nfca"]) * env
    for r, (d, gap, p2) in enumerate(plan["a_rates"]):
        box = boxes[p2]
        b0, b1, bg = shift(box, d), shift(box, d + 1), shift(box, d + gap)
        sd = ((b0 - bg) - (bg - b1)) / jnp.float32(p2)
        mask = power_ok & (jnp.abs(sd) > min_corr_a)
        mval += jnp.where(mask, jnp.float32(MASK_BITS_A[r]), 0.0)

    min_corr_f = jnp.float32(thr["nfcf"]) * env
    for r, (d, gap, p2) in enumerate(plan["f_rates"]):
        box = boxes[p2]
        b0, b1, bg = shift(box, d), shift(box, d + 1), shift(box, d + gap)
        sd = ((b0 - bg) - (bg - b1)) / jnp.float32(p2)
        mask = power_ok & (jnp.abs(sd) > min_corr_f)
        mval += jnp.where(mask, jnp.float32(MASK_BITS_F[r]), 0.0)

    edge_b = -(jnp.float32(thr["nfcb"]) * env)
    for r, d in enumerate(plan["b_delays"]):
        mask = power_ok & (shift(filt, d) < edge_b)
        mval += jnp.where(mask, jnp.float32(MASK_BITS_B[r]), 0.0)

    dv, gapv, p2v = plan["v_rate"]
    box = boxes[p2v]
    u0, ug = shift(box, dv), shift(box, dv + gapv)
    sd_v = (ug - u0) / jnp.float32(p2v)
    mask_v = power_ok & (sd_v > jnp.float32(thr["nfcv"]) * env)
    mval += jnp.where(mask_v, jnp.float32(MASK_BIT_V), 0.0)
    return mval


@functools.lru_cache(maxsize=8)
def _sharded_step(params_tuple, mask_params, sample_rate: int,
                  n_devices: int, nb_loc: int, L: int, H: int, devices=None,
                  no_collective: bool = False):
    """jit: rows[NB, L] sharded over a 1-D `blocks` mesh -> channel dict
    with the same sharding.  Halos travel by ppermute inside shard_map.
    Rate-parametric: the channel widths/delays come from
    dsp.tpu_channels.channel_plan(sample_rate).

    no_collective=True replaces the ppermute halo with a locally-sourced
    stand-in of identical shape/compute — WRONG values, used only by the
    scaling harness to isolate the collective's share of step time."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    shard_map = jax.shard_map

    from ..dsp.conditioner import _build_scan
    from ..dsp.tpu_channels import channel_plan
    from .temporal import halo_exchange

    plan = channel_plan(sample_rate)
    devs = list(devices) if devices else jax.devices()[:n_devices]
    mesh = Mesh(np.array(devs), ("blocks",))
    scan = _build_scan(params_tuple)
    power_thr, a_thr, b_deep, f_thr, v_thr = mask_params
    thr = {"nfca": a_thr, "nfcb": b_deep, "nfcf": f_thr, "nfcv": v_thr}
    W = H + L

    def box_sum(x, width, seg=512):
        """Trailing-window box sum with SEGMENTED cumsum: both window
        endpoints difference against the same local segment accumulation,
        so roundoff is ~eps*seg_sum instead of ~eps*stream_cumsum (a plain
        W-long f32 cumsum differencing flips threshold-adjacent decode
        samples; validated golden-exact by tests/test_multichip.py)."""
        r, w_len = x.shape
        assert w_len % seg == 0 and width <= seg
        xs = x.reshape(r, w_len // seg, seg)
        c = jnp.cumsum(xs, axis=-1)  # local inclusive cumsum per segment
        tails = c[..., -1]
        cprev = jnp.pad(c[:, :-1], ((0, 0), (1, 0), (0, 0)))
        tprev = jnp.pad(tails[:, :-1], ((0, 0), (1, 0)))
        o = jnp.arange(seg)
        # window inside one segment: exact local difference
        case1 = c - jnp.roll(c, width, axis=-1)
        # window crossing a boundary: local value + tail of prev segment
        c2 = cprev[..., jnp.clip(o + seg - width, 0, seg - 1)]
        case2 = c + (tprev[..., None] - c2)
        return jnp.where(o >= width, case1, case2).reshape(r, w_len)

    def local_step(rows):  # [nb_loc, L] on each device
        dev = jax.lax.axis_index("blocks")
        # the one inter-device halo: my last block's tail goes right, my
        # first block's halo arrives from the left neighbour (ring ppermute;
        # the wrap into device 0 is replaced by the zero halo of stream
        # start below)
        if no_collective:  # timing-isolation variant (scaling harness)
            recv = rows[-1, L - H:]
        else:
            recv = halo_exchange(rows[-1], H, "blocks")
        halos = jnp.concatenate(
            [recv[None], rows[:-1, L - H:]], axis=0
        )  # [nb_loc, H]
        row_ids = dev * nb_loc + jnp.arange(nb_loc)
        first = row_ids == 0
        halos = jnp.where(first[:, None], 0.0, halos)
        windows = jnp.concatenate([halos, rows], axis=1)  # [nb_loc, W]

        # conditioning from zero carry; block 0's clock/pulse start at -H so
        # its zero halo leaves exactly the fresh-stream state at sample 0.
        # The initial carries must be marked device-varying for the scan
        # under shard_map (they differ per device via `first`).
        zeros_f = jax.lax.pcast(
            jnp.zeros(nb_loc, jnp.float32), ("blocks",), to="varying"
        )
        neg_h = jnp.where(first, jnp.int32(-H), jnp.int32(0))
        outs = scan(
            windows, zeros_f, zeros_f, zeros_f, zeros_f, neg_h, neg_h
        )
        env, _w1, _mdev, _avg, filt, _pulse = (o.T for o in outs)

        res = {}
        boxes = {}
        for w in plan["bv"]:
            boxes[w] = box_sum(windows, w)
            res[f"bv{w}"] = boxes[w]
        sq = filt * filt * jnp.float32(10.0)
        for w in plan["q"]:
            res[f"q{w}"] = box_sum(sq, w)
        for lag, box in plan["pb"]:
            prod = (
                jnp.pad(filt[:, lag:] * filt[:, :-lag], ((0, 0), (lag, 0)))
                * jnp.float32(10.0)
            )
            res[f"p{lag}x{box}"] = box_sum(prod, box)
        res["detect_mask"] = _mask_val(
            env, filt, boxes, power_thr, thr, plan
        )
        # keep only the body region (drop the halo)
        return {k: v[:, H:] for k, v in res.items()}

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=P("blocks", None), out_specs=P("blocks", None),
    )
    sharding = NamedSharding(mesh, P("blocks", None))
    return jax.jit(step, in_shardings=sharding), sharding


def sharded_capture_channels(
    samples: np.ndarray,
    sample_rate: int,
    n_devices: int | None = None,
    devices=None,
    L: int = DEFAULT_L,
    H: int = DEFAULT_H,
    power_level_threshold: float = 0.01,
    thresholds=None,
) -> dict[str, np.ndarray]:
    """Compute the decode channel set for one capture on a device mesh;
    returns host f32 arrays (len(samples)) keyed like
    dsp.tpu_channels._FETCH (box channels + packed detect_mask)."""
    import jax

    from ..core.params import SignalParams
    from ..dsp.frontend import _params_tuple
    from ..dsp.tpu_channels import channel_plan

    # the halo must cover the 1024-sample ring warm-up + the conditioning
    # silence window (10 ETU) + the deepest correlator lookback, all of
    # which scale with the sample rate except the ring
    plan = channel_plan(sample_rate)
    dv, gapv, _ = plan["v_rate"]
    etu = max(1, round(128 * sample_rate / 13.56e6))
    need = 1024 + 2 * (dv + gapv) + 10 * etu
    if H < need:
        raise ValueError(
            f"halo H={H} too small for {sample_rate} S/s (needs >= {need}); "
            "pass a larger H"
        )
    seg = 512
    if max(plan["bv"] + plan["q"]) > seg:
        raise ValueError(
            f"box width exceeds the segmented-cumsum segment ({seg}); "
            f"sample rate {sample_rate} is beyond the sharded frontend's "
            "current range"
        )
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    n_dev = len(devices)
    samples = np.ascontiguousarray(samples, np.float32)
    n = len(samples)
    nb = max(1, -(-n // L))
    nb_pad = -(-nb // n_dev) * n_dev
    rows = np.zeros((nb_pad, L), np.float32)
    flat = rows.reshape(-1)[: n]
    flat[:] = samples

    from ..core.thresholds import DecoderThresholds

    params = SignalParams(
        sample_rate, power_level_threshold=power_level_threshold
    )
    mask_params = (thresholds or DecoderThresholds()).detect_mask_tuple(
        power_level_threshold
    )
    step, sharding = _sharded_step(
        _params_tuple(params), mask_params, int(sample_rate), n_dev,
        nb_pad // n_dev, L, H, tuple(devices),
    )
    arr = jax.device_put(rows, sharding)
    out_dev = step(arr)
    return {
        k: _fetch_global(v).reshape(-1)[: n] for k, v in out_dev.items()
    }


def _fetch_global(v) -> np.ndarray:
    """Materialize a mesh-sharded [nb, L] output on the host.  In a
    multi-process run each process only addresses its own shards, so the
    block rows are all-gathered across processes first (the host walk
    needs the whole capture; shard/launch.py multi-host contract)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(v, tiled=True))
    return np.asarray(v)


@functools.lru_cache(maxsize=2)
def _sharded_kernel_step(params_tuple, mask_params, n_devices: int,
                         nb_loc: int, L: int, H: int, devices=None,
                         sample_rate: int = 10_000_000):
    """jit: rows[NB, L] sharded over a 1-D `blocks` mesh -> channel dict,
    computed by the PRODUCTION fused Pallas kernel inside shard_map (the
    real multi-chip hot path: per-device windows pad to the kernel's
    LANES batch and run at kernel rate; halos cross devices by ppermute).
    Windows match dsp.tpu_channels._run_batch_blocks bit-exactly: row 0 is
    [body | next-H] (fresh-stream state at sample 0), other rows
    [left-halo | body]."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..dsp.pallas.fused_frontend import LANES, fused_frontend
    from ..dsp.tpu_channels import fetch_names

    fetch = fetch_names(sample_rate)
    from .temporal import halo_exchange

    assert nb_loc <= LANES, "more than LANES blocks per device unsupported"
    devs = list(devices) if devices else jax.devices()[:n_devices]
    mesh = Mesh(np.array(devs), ("blocks",))
    n_dev = len(devs)

    def local_step(rows):  # [nb_loc, L] on each device
        dev = jax.lax.axis_index("blocks")
        # left halos: my first block's halo arrives from the left
        # neighbour's last block tail over ICI
        recv = halo_exchange(rows[-1], H, "blocks")
        halos = jnp.concatenate([recv[None], rows[:-1, L - H:]], axis=0)
        row_ids = dev * nb_loc + jnp.arange(nb_loc)
        first = row_ids == 0
        halos = jnp.where(first[:, None], 0.0, halos)
        windows = jnp.concatenate([halos, rows], axis=1)  # [nb_loc, W]

        # stream-head row layout is [body | next-H] (exact fresh-stream
        # conditioning); the next-H of my last row comes from the right
        # neighbour's first row head
        head = rows[0, :H]
        recv_head = jax.lax.ppermute(
            head, "blocks", [(i, (i - 1) % n_dev) for i in range(n_dev)]
        )
        nexts = jnp.concatenate(
            [rows[1:, :H], recv_head[None]], axis=0
        )
        # the global last row's "next" wraps to the stream head; its true
        # continuation is past-capture zeros (only reachable when the
        # capture fits one row)
        last = row_ids == n_dev * nb_loc - 1
        nexts = jnp.where(last[:, None], 0.0, nexts)
        windows_head = jnp.concatenate([rows, nexts], axis=1)
        windows = jnp.where(first[:, None], windows_head, windows)

        pad = LANES - nb_loc
        wp = jnp.pad(windows, ((0, pad), (0, 0)))
        res = fused_frontend(
            wp, params_tuple, native_layout=False,
            mask_params=mask_params, select=fetch,
            sample_rate=sample_rate,
        )
        out = {}
        for k, v in res.items():
            v = v[:nb_loc]
            body = jnp.where(first[:, None], v[:, :L], v[:, H:])
            out[k] = body
        return out

    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=P("blocks", None), out_specs=P("blocks", None),
        # pallas_call output avals carry no varying-mesh-axes annotation;
        # every output here is per-device data (blocks-sharded), so the vma
        # check adds nothing
        check_vma=False,
    )
    sharding = NamedSharding(mesh, P("blocks", None))
    return jax.jit(step, in_shardings=sharding), sharding


def sharded_kernel_channels(
    samples: np.ndarray,
    sample_rate: int,
    n_devices: int | None = None,
    devices=None,
    L: int = DEFAULT_L,
    H: int = DEFAULT_H,
    power_level_threshold: float = 0.01,
    thresholds=None,
) -> dict[str, np.ndarray]:
    """Multi-chip channel computation with the production Pallas kernel
    inside shard_map, rate-parametric via fused_frontend.kernel_plan.
    Bit-identical to dsp.tpu_channels.fused_capture_channels (validated on
    hardware by tools/validate_tpu_shard_kernel)."""
    import jax

    from ..core.params import SignalParams
    from ..core.thresholds import DecoderThresholds
    from ..dsp.frontend import _params_tuple

    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    n_dev = len(devices)
    samples = np.ascontiguousarray(samples, np.float32)
    n = len(samples)
    nb = max(1, -(-n // L))
    nb_pad = -(-nb // n_dev) * n_dev
    rows = np.zeros((nb_pad, L), np.float32)
    rows.reshape(-1)[:n] = samples

    params = SignalParams(
        sample_rate, power_level_threshold=power_level_threshold
    )
    mask_params = (thresholds or DecoderThresholds()).detect_mask_tuple(
        power_level_threshold
    )
    step, sharding = _sharded_kernel_step(
        _params_tuple(params), tuple(mask_params), n_dev, nb_pad // n_dev,
        L, H, tuple(devices), sample_rate=sample_rate,
    )
    arr = jax.device_put(rows, sharding)
    out_dev = step(arr)
    return {k: _fetch_global(v).reshape(-1)[:n] for k, v in out_dev.items()}


def decode_sharded(
    samples: np.ndarray,
    sample_rate: int,
    n_devices: int | None = None,
    devices=None,
    **decoder_kwargs,
):
    """Full multi-device decode to frames: mesh-sharded channels + host event
    walk.  Returns the same frame list as NfcDecoder.decode (golden-equal;
    asserted by tests/test_multichip.py)."""
    from ..runtime.decoder import NfcDecoder

    dec = NfcDecoder(**decoder_kwargs)
    chans = sharded_capture_channels(
        samples, sample_rate, n_devices=n_devices, devices=devices,
        power_level_threshold=dec.power_level_threshold,
        thresholds=dec.thresholds,
    )
    return dec.decode(samples, sample_rate, tpu_channels=chans)
