"""Batched dense decode frontend (the TPU hot path).

Everything the host FSMs consume is computed here as one jitted array program
over a batch of signal blocks [B, T]:

- conditioning scan (envelope, IIR-filtered, deviation, average) — `lax.scan`
  over time carrying [B]-wide state (every step a full-width VPU op)
- modulation depth
- per-tech/rate correlator channels: half-symbol box sums of the raw value,
  squared-filtered listen channel, BPSK product integrator windows
  (NfcA.cpp:236-255, 963-973, 1243-1266 and the B/F/V equivalents)
- detect event masks per tech

This frontend is the unit the temporal/batch sharding layers (nfclab.shard)
distribute over a device mesh; the host symbol-walk consumes only the sparse
mask events.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..core import nfc
from ..core.params import SignalParams, nfca_bitrates
from .conditioner import _scan_fn


def _params_tuple(params: SignalParams):
    return (
        np.float32(params.signal_enve_w0),
        np.float32(params.signal_enve_w1),
        np.float32(params.signal_mdev_w0),
        np.float32(params.signal_mdev_w1),
        np.float32(params.signal_mean_w0),
        np.float32(params.signal_mean_w1),
        np.float32(params.signal_iir_dc_a),
        np.int32(params.elementary_time_unit),
    )


def _box_sum_t(x, width: int):
    """Boxcar sum over the trailing `width` samples along the last axis,
    with an implicit zero left pad (matches the reference ring warm-up)."""
    import jax.numpy as jnp

    c = jnp.cumsum(x, axis=-1)
    return c - jnp.pad(c[..., :-width], ((0, 0), (width, 0)))


def _default_corr_thresholds() -> dict:
    """Per-tech detect-trigger thresholds from the single source of truth
    (core.thresholds): A/F/V correlation, B minimumModulationDeep."""
    from ..core.thresholds import DecoderThresholds

    d = DecoderThresholds()
    return {
        "nfca": d.nfca.correlation,
        "nfcb": d.nfcb.min_modulation_deep,
        "nfcf": d.nfcf.correlation,
        "nfcv": d.nfcv.correlation,
    }


def make_frontend(params: SignalParams, corr_thresholds: dict | None = None):
    """Build the jittable frontend fn: value[B, T] -> dict of dense outputs.

    corr_thresholds: per-tech correlation thresholds (defaults mirror the
    reference: A=0.75, B=0.10 edge, F=0.50, V=0.50).
    """
    import jax
    import jax.numpy as jnp

    pt = _params_tuple(params)
    thr = _default_corr_thresholds()
    if corr_thresholds:
        thr.update(corr_thresholds)
    bitrates_a = nfca_bitrates(params.sample_rate)

    from .conditioner import _build_scan

    scan = _build_scan(pt)

    def frontend(value):
        b, t = value.shape
        zeros_f = jnp.zeros(b, jnp.float32)
        zeros_i = jnp.zeros(b, jnp.int32)
        if b % 1024 == 0 and t % 256 == 0:
            # VPU-native Pallas path (bit-exact with the scan path)
            from .pallas.conditioner_kernel import condition_scan_pallas

            env, _w1, mdev, avg, filt, _pulse = condition_scan_pallas(
                value, zeros_f, zeros_f, zeros_f, zeros_f, zeros_i, zeros_i, pt
            )
        else:
            outs = scan(
                value, zeros_f, zeros_f, zeros_f, zeros_f, zeros_i, zeros_i
            )
            env, _w1, mdev, avg, filt, _pulse = (o.T for o in outs)

        clamped = jnp.maximum(0.0, jnp.minimum(value, env))
        mdepth = (env - clamped) / env

        out = {
            "envelope": env,
            "filtered": filt,
            "deviation": mdev,
            "average": avg,
            "mod_depth": mdepth,
        }

        # NFC-A/B/F detect channels share the raw-value box sums; compute one
        # per distinct half-symbol width
        widths = sorted({br.period2 for br in bitrates_a})
        boxes = {w: _box_sum_t(value, w) for w in widths}

        sq = filt * filt * jnp.float32(10.0)

        for br in bitrates_a:
            d, p1, p2 = br.symbol_delay_detect, br.period1, br.period2
            box = boxes[p2]
            gap = p1 - p2
            # SD(t) = ((B(t-d) - B(t-d-gap)) - (B(t-d-gap) - B(t-d-1))) / p2
            bm0 = box
            bm_g = jnp.pad(box[:, :-gap], ((0, 0), (gap, 0)))
            bm_1 = jnp.pad(box[:, :-1], ((0, 0), (1, 0)))
            sd = ((bm0 - bm_g) - (bm_g - bm_1)) / jnp.float32(p2)
            sd = jnp.pad(sd[:, : t - d], ((0, 0), (d, 0))) if d else sd
            out[f"sd_a_{br.rate_type}"] = sd
            # detect mask (NfcA.cpp:224-291): |SD| above correlation threshold
            # at power-ok samples
            out[f"mask_a_{br.rate_type}"] = (
                env >= jnp.float32(params.power_level_threshold)
            ) & (jnp.abs(sd) > jnp.float32(thr["nfca"]) * env)
            # listen squared channel box for this width
            out[f"boxq_{p2}"] = _box_sum_t(sq, p2)

        # BPSK product channels for A r212/424 (p1 lags 47/24)
        for br in bitrates_a[1:]:
            p1, p4, d = br.period1, br.period4, br.symbol_delay_detect
            prod = jnp.pad(filt[:, p1:] * filt[:, :-p1], ((0, 0), (p1, 0)))
            prod = prod * jnp.float32(10.0)
            pb4 = _box_sum_t(prod, p4)
            out[f"pb4_a_{br.rate_type}"] = jnp.pad(
                pb4[:, : t - d], ((0, 0), (d, 0))
            )

        power_ok = env >= jnp.float32(params.power_level_threshold)

        # NFC-B falling-edge trigger masks (NfcB.cpp:283): filt[t-d] below
        # -minDeep*env at power-ok samples, delays 0 and p2(106k)*2
        d_b106 = bitrates_a[0].period1  # 94 at 10 MS/s
        for d in (0, d_b106):
            fd = jnp.pad(filt[:, : t - d], ((0, 0), (d, 0))) if d else filt
            out[f"mask_b_{d}"] = power_ok & (
                fd < -(jnp.float32(thr["nfcb"]) * env)
            )

        # NFC-F correlation masks: A's SD family at d=0 over the same
        # half-symbol boxes (NfcF.cpp detect)
        for br in bitrates_a[1:]:
            p1, p2 = br.period1, br.period2
            box = boxes[p2]
            gap = p1 - p2
            bm_g = jnp.pad(box[:, :-gap], ((0, 0), (gap, 0)))
            bm_1 = jnp.pad(box[:, :-1], ((0, 0), (1, 0)))
            sd = ((box - bm_g) - (bm_g - bm_1)) / jnp.float32(p2)
            out[f"mask_f_{br.rate_type}"] = power_ok & (
                jnp.abs(sd) > jnp.float32(thr["nfcf"]) * env
            )

        # NFC-V signed SD mask (NfcV.cpp:236-435): reversed-difference SD
        # over the half-symbol box at delay period0
        from ..demod.nfcv import nfcv_bitrate

        brv = nfcv_bitrate(params.sample_rate)
        p2v, p1v, dv = brv.period2, brv.period1, brv.symbol_delay_detect
        gapv = p1v - p2v
        boxv = _box_sum_t(value, p2v)
        u0 = jnp.pad(boxv[:, : t - dv], ((0, 0), (dv, 0)))
        ug = jnp.pad(boxv[:, : t - dv - gapv], ((0, 0), (dv + gapv, 0)))
        sd_v = (ug - u0) / jnp.float32(p2v)
        out["mask_v"] = power_ok & (sd_v > jnp.float32(thr["nfcv"]) * env)

        return out

    return frontend


@functools.lru_cache(maxsize=8)
def jitted_frontend(sample_rate: int, power_level_threshold: float = 0.01):
    import jax

    params = SignalParams(sample_rate, power_level_threshold=power_level_threshold)
    return jax.jit(make_frontend(params))


def make_fused_frontend(
    params: SignalParams,
    corr_thresholds: dict | None = None,
    native_layout: bool = True,
):
    """Production-throughput frontend: the fused Pallas kernel (conditioning
    + mod depth + every box channel in one sweep) plus in-kernel detect
    triggers for ALL four technologies packed into the single `detect_mask`
    bitfield output.  Box sums carry the same f32 running-sum roundoff
    family as the reference's own integrators; the bit-exact golden path
    uses the unfused conditioner + host f64 channels.

    native_layout keeps everything in the kernel's [g, t, sub, 128] tiling
    (sub = 16 when B % 2048 == 0, else 8) so no output pays an HBM transpose
    back to [B, T]."""
    from .pallas.fused_frontend import fused_frontend

    pt = _params_tuple(params)
    thr = _default_corr_thresholds()
    if corr_thresholds:
        thr.update(corr_thresholds)
    mask_params = (
        float(params.power_level_threshold),
        float(thr["nfca"]),
        float(thr["nfcb"]),
        float(thr["nfcf"]),
        float(thr["nfcv"]),
    )

    def run(value):
        return fused_frontend(
            value, pt, native_layout=native_layout, mask_params=mask_params
        )

    return run


@functools.lru_cache(maxsize=8)
def jitted_fused_frontend(sample_rate: int, power_level_threshold: float = 0.01):
    import jax

    params = SignalParams(sample_rate, power_level_threshold=power_level_threshold)
    return jax.jit(make_fused_frontend(params))
