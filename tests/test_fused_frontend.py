"""Fused Pallas frontend validation.

Two tiers:
- default-on CPU trace tests: abstract-eval every kernel variant (resident +
  DMA state, full + selected output sets).  The round-1 breakage was a
  trace-time TypeError that shipped because nothing cheap exercised the hot
  path — these tests need no TPU and fail on any signature/arity drift.
- TPU value tests: run the validation tools whenever a TPU is present
  (subprocess because the pytest session pins JAX to CPU).  A persistent
  compilation cache bounds the cost of repeat runs.
"""

import functools
import os
import subprocess
import sys

import pytest


@functools.lru_cache(maxsize=1)
def _tpu_available() -> bool:
    if os.environ.get("NFCLAB_SKIP_TPU_TESTS", "") == "1":
        return False
    probe = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; print(jax.devices()[0].platform)",
        ],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return probe.returncode == 0 and "cpu" not in probe.stdout


def _trace_variant(impl_name: str, sub: int, select):
    from conftest import ensure_cpu_devices

    ensure_cpu_devices()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nfclab.core.params import SignalParams
    from nfclab.dsp.frontend import _params_tuple
    from nfclab.dsp.pallas import fused_frontend as ff

    from nfclab.core.thresholds import DecoderThresholds

    pt = _params_tuple(SignalParams(10_000_000))
    mp = tuple(
        np.float32(m) for m in DecoderThresholds().detect_mask_tuple(0.01)
    )
    sel = ff._normalize_select(select)
    impl = getattr(ff, impl_name)
    g, t = 1, 2 * ff.TILE
    run = impl(pt, mp, g, t, sub, sel)
    base = jnp.zeros((1,), jnp.int32)
    v = jax.ShapeDtypeStruct((g, t, sub, 128), jnp.float32)
    st = jax.ShapeDtypeStruct((g, ff.NSTATE, sub, 128), jnp.float32)
    out = jax.eval_shape(run, jax.ShapeDtypeStruct((1,), jnp.int32), v, st)
    assert len(out) == len(sel) + 1
    for name, o in zip(sel, out):
        assert o.shape == (g, t, sub, 128), name
    assert out[-1].shape == (g, ff.NSTATE, sub, 128)


_DECODE_SELECT = (
    "bv12", "bv24", "bv47", "bv94", "q47", "q189",
    "p24x6", "p47x12", "p94x24", "detect_mask",
)


@pytest.mark.parametrize("impl", ["_jitted", "_jitted_dma"])
@pytest.mark.parametrize("select", [None, _DECODE_SELECT, ("envelope",)])
def test_fused_kernel_traces_on_cpu(impl, select):
    """Abstract-eval of every kernel variant (no TPU needed): catches
    trace-time arity/shape drift like the round-1 _fused_kernel breakage."""
    _trace_variant(impl, 32 if impl == "_jitted_dma" else 16, select)


def test_segmented_mask_jit_traces_on_cpu():
    """Abstract-eval of the segment-parallel chained-mask engine
    (tpu_channels._segmented_mask_jit): output arities/shapes — compacted
    triggers per lane, verification carries, and the full-state carry
    handoff rows."""
    from conftest import ensure_cpu_devices

    ensure_cpu_devices()
    import jax
    import numpy as np

    from nfclab.core.params import SignalParams
    from nfclab.dsp.frontend import _params_tuple
    from nfclab.dsp.pallas.fused_frontend import TILE, kernel_plan
    from nfclab.dsp.tpu_channels import (
        _NVER, _segmented_mask_jit, chained_mask_params,
    )

    rate = 10_000_000
    pt = _params_tuple(SignalParams(rate, power_level_threshold=0.01))
    mp = chained_mask_params(0.01)
    S, B, chunk, n_live, cap = 2, 2, TILE, 2, 4096
    plan = kernel_plan(rate)
    fn = _segmented_mask_jit(pt, mp, S, B, chunk, n_live,
                             plan.fold_modulus, cap, rate)
    out = jax.eval_shape(
        fn,
        jax.ShapeDtypeStruct((n_live, S * B * chunk), np.float32),
        jax.ShapeDtypeStruct((n_live, chunk), np.float32),
        jax.ShapeDtypeStruct((n_live, plan.nstate), np.float32),
    )
    n_lanes = n_live * S
    mm, idx, bits, cnt, vh, ve, pen, end, end_all = out
    assert mm.shape == (n_lanes, B * chunk) and mm.dtype == np.uint8
    assert idx.shape == (n_lanes, cap) and idx.dtype == np.int32
    assert bits.shape == (n_lanes, cap) and bits.dtype == np.uint8
    assert cnt.shape == (n_lanes,)
    assert vh.shape == ve.shape == (n_lanes, _NVER)
    assert pen.shape == end.shape == (n_live, plan.nstate)
    assert end_all.shape == (n_lanes, plan.nstate)


def test_fused_frontend_select_validates_names():
    from nfclab.dsp.pallas.fused_frontend import _normalize_select

    with pytest.raises(ValueError):
        _normalize_select(("bv12", "nonesuch"))


@pytest.mark.tpu
@pytest.mark.skipif(
    not _tpu_available(),
    reason="no TPU device (set NFCLAB_SKIP_TPU_TESTS=1 to silence the probe)",
)
def test_fused_frontend_matches_unfused_on_tpu():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "nfclab.tools.validate_fused"],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=repo,
    )
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.tpu
@pytest.mark.skipif(
    not _tpu_available(),
    reason="no TPU device (set NFCLAB_SKIP_TPU_TESTS=1 to silence the probe)",
)
def test_tpu_kernel_in_shard_map_bitexact():
    """The production fused kernel inside shard_map (the real multi-chip
    path) is bit-exact vs the single-device overlap-save path and stays
    golden (tools/validate_tpu_shard_kernel)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "nfclab.tools.validate_tpu_shard_kernel"],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=repo,
    )
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.tpu
@pytest.mark.skipif(
    not _tpu_available(),
    reason="no TPU device (set NFCLAB_SKIP_TPU_TESTS=1 to silence the probe)",
)
def test_tpu_stream_farm_matches_goldens():
    """Concurrent multi-stream decode with carried kernel state
    (tools/validate_tpu_farm)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "nfclab.tools.validate_tpu_farm"],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=repo,
    )
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.tpu
@pytest.mark.skipif(
    not _tpu_available(),
    reason="no TPU device (set NFCLAB_SKIP_TPU_TESTS=1 to silence the probe)",
)
def test_tpu_fed_decode_matches_goldens():
    """Fused-kernel channels + detect indices feed the host walk; frames
    must stay golden-equal (tools/validate_tpu_decode)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "nfclab.tools.validate_tpu_decode"],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=repo,
    )
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.tpu
@pytest.mark.skipif(
    not _tpu_available(),
    reason="no TPU device (set NFCLAB_SKIP_TPU_TESTS=1 to silence the probe)",
)
def test_tpu_logic_frontend_matches_host():
    """Device logic event-mask frontend: index sets + frames equal the host
    path (tools/validate_tpu_logic)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "nfclab.tools.validate_tpu_logic"],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=repo,
    )
    assert res.returncode == 0, res.stdout + res.stderr


def test_kernel_plan_reproduces_10msps_constants():
    """The rate-parametric plan must derive the original hand-written
    10 MS/s kernel constants exactly."""
    from nfclab.dsp.pallas import fused_frontend as ff

    p = ff.kernel_plan(10_000_000)
    assert p.bv_widths == (12, 24, 47, 94)
    assert p.q_widths == (47, 189)
    assert p.pb == ((24, 6), (47, 12), (94, 24))
    assert (p.rv_ring, p.rf_ring, p.rq_ring) == (128, 128, 256)
    assert p.rp_rings == (8, 16, 32)
    assert p.a_rates == ((0, 47, 47, 2), (94, 23, 24, 1), (141, 12, 12, 0))
    assert p.b_delays == (0, 94)
    assert p.f_rates == ((0, 23, 24, 1), (0, 12, 12, 0))
    assert p.v_rate == (378, 95, 94, 3)
    # history lengths per width (12, 24, 47, 94) + filt
    assert p.h_sizes == (153, 117, 47, 473, 94)
    assert p.nstate == ff.NSTATE
    assert p.fold_modulus == 512
    assert p.output_names == tuple(ff.OUTPUT_NAMES)


@pytest.mark.parametrize("rate", [3_200_000, 8_000_000])
def test_fused_kernel_traces_at_other_rates(rate):
    """Rate-parametric kernel variants abstract-eval on CPU: the plan's
    ring/history/state geometry must be internally consistent at the
    degraded RTL-SDR rate (3.2 MS/s) and a resampled rate."""
    from conftest import ensure_cpu_devices

    ensure_cpu_devices()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nfclab.core.params import SignalParams
    from nfclab.core.thresholds import DecoderThresholds
    from nfclab.dsp.frontend import _params_tuple
    from nfclab.dsp.pallas import fused_frontend as ff

    plan = ff.kernel_plan(rate)
    pt = _params_tuple(SignalParams(rate))
    mp = tuple(
        np.float32(m) for m in DecoderThresholds().detect_mask_tuple(0.01)
    )
    for sel in (None, ("detect_mask",)):
        sel_t = ff._normalize_select(sel, plan)
        run = ff._jitted(pt, mp, 1, 2 * ff.TILE, 8, sel_t, plan)
        v = jax.ShapeDtypeStruct((1, 2 * ff.TILE, 8, 128), jnp.float32)
        st = jax.ShapeDtypeStruct((1, plan.nstate, 8, 128), jnp.float32)
        out = jax.eval_shape(
            run, jax.ShapeDtypeStruct((1,), jnp.int32), v, st
        )
        assert len(out) == len(sel_t) + 1
        assert out[-1].shape == (1, plan.nstate, 8, 128)


@pytest.mark.tpu
@pytest.mark.skipif(
    not _tpu_available(),
    reason="no TPU device (set NFCLAB_SKIP_TPU_TESTS=1 to silence the probe)",
)
def test_rate_parametric_kernel_on_tpu():
    """Device frontends at 3.2 MS/s (degraded RTL-SDR mode) and 8 MS/s
    (resampled) must frame-equal the rate-generic host decode
    (tools/validate_rate_parametric)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "nfclab.tools.validate_rate_parametric"],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=repo,
    )
    assert res.returncode == 0, res.stdout + res.stderr
