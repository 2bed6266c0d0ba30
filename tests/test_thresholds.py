"""Per-tech decoder threshold configuration (NfcDecoder.h:79-117 parity).

The reference exposes setModulationThresholdNfcA/B/F/V(min,max) and
setCorrelationThresholdNfcA/B/F/V, merged from JSON config
(RadioDecoderTask.cpp:207-366 configDecoder).  core.thresholds is the
single source of truth: these tests pin the defaults, the setter/config
plumbing, and — the part that matters — that a non-default threshold
actually changes what decodes on every frontend (host walk, preloaded
kernel-channel path, mesh-sharded path), while the defaults stay
golden-exact (tests/test_golden.py)."""

import numpy as np
import pytest

from nfclab.core.thresholds import DecoderThresholds
from nfclab.io.golden import GOLDEN_TYPES
from nfclab.io.wav import read_wav
from nfclab.runtime.decoder import NfcDecoder


def _native_ok():
    from nfclab.native.binding import native_available

    return native_available()


def test_defaults_match_reference():
    th = DecoderThresholds()
    # NfcA.cpp:94-100 / NfcB.cpp:103-109 / NfcF.cpp:88-94 / NfcV.cpp:101-107
    assert (th.nfca.min_modulation_deep, th.nfca.max_modulation_deep,
            th.nfca.correlation) == (0.90, 1.00, 0.75)
    assert (th.nfcb.min_modulation_deep, th.nfcb.max_modulation_deep,
            th.nfcb.correlation) == (0.10, 0.90, 0.50)
    assert (th.nfcf.min_modulation_deep, th.nfcf.max_modulation_deep,
            th.nfcf.correlation) == (0.10, 0.90, 0.50)
    assert (th.nfcv.min_modulation_deep, th.nfcv.max_modulation_deep,
            th.nfcv.correlation) == (0.90, 1.00, 0.50)
    # the detect-trigger 5-tuple consumed by the fused kernel mask_params
    assert th.detect_mask_tuple(0.01) == (0.01, 0.75, 0.10, 0.50, 0.50)


def test_facade_setters():
    dec = NfcDecoder()
    dec.set_modulation_threshold_nfca(0.5, 0.95)
    dec.set_correlation_threshold_nfca(0.6)
    dec.set_modulation_threshold_nfcv(0.7, 0.99)
    dec.set_correlation_threshold_nfcb(0.4)
    th = dec.thresholds
    assert th.nfca.min_modulation_deep == 0.5
    assert th.nfca.max_modulation_deep == 0.95
    assert th.nfca.correlation == 0.6
    assert th.nfcv.min_modulation_deep == 0.7
    assert th.nfcb.correlation == 0.4
    # untouched techs keep reference defaults
    assert th.nfcf.correlation == 0.50


def test_from_config_merges_protocol_tree():
    """RadioDecoderTask.cpp:240-345 semantics: correlationThreshold applies
    alone; modulation deep min/max apply only when both are present."""
    from nfclab.runtime.config import Config

    cfg = Config({
        "decoder": {
            "protocol": {
                "nfca": {
                    "correlationThreshold": 0.65,
                    "minimumModulationDeep": 0.55,
                    "maximumModulationDeep": 0.98,
                },
                "nfcb": {"minimumModulationDeep": 0.2},  # no max -> ignored
                "nfcv": {"enabled": False, "correlationThreshold": 0.33},
            },
        },
    })
    dec = NfcDecoder.from_config(cfg)
    th = dec.thresholds
    assert th.nfca.correlation == 0.65
    assert th.nfca.min_modulation_deep == 0.55
    assert th.nfca.max_modulation_deep == 0.98
    assert th.nfcb.min_modulation_deep == 0.10  # lone min did not apply
    assert th.nfcv.correlation == 0.33
    assert dec.enable_nfcv is False


def test_techs_read_thresholds_from_context():
    """The demod FSMs consume the configured values (they drive both the
    Python walkers and the native C++ FSM marshaling)."""
    from nfclab.core.params import SignalParams
    from nfclab.native import condition_exact
    from nfclab.runtime.decoder import DecoderContext

    if not _native_ok():
        pytest.skip("native library unavailable")
    samples = np.full(4096, 0.3, np.float32)
    params = SignalParams(10_000_000)
    cond = condition_exact(samples, params)
    th = DecoderThresholds()
    th.nfca.correlation = 0.6
    th.nfcf.min_modulation_deep = 0.25
    ctx = DecoderContext(cond, 10_000_000, params, thresholds=th)
    dec = NfcDecoder(thresholds=th)
    techs = {type(t).__name__: t for t in dec._make_techs(ctx)}
    assert float(techs["NfcATech"].correlation_threshold) == np.float32(0.6)
    assert float(techs["NfcFTech"].minimum_modulation_deep) == np.float32(
        0.25
    )


FIXTURE = "test_NFC-A_106kbps_002"


@pytest.fixture(scope="module")
def capture(fixture_dir):
    samples, info = read_wav(str(fixture_dir / f"{FIXTURE}.wav"))
    return samples, info.sample_rate


def _impossible_nfca():
    """NfcA correlation threshold no real signal can cross: the detect
    correlator never fires, so an NFC-A capture decodes to carrier events
    only.  This is the observable contract of the knob."""
    th = DecoderThresholds()
    th.nfca.correlation = 5.0
    return th


@pytest.mark.skipif(not _native_ok(), reason="native library unavailable")
def test_host_decode_respects_thresholds(capture):
    samples, rate = capture
    default = NfcDecoder().decode(samples, rate)
    assert any(f.frame_type in GOLDEN_TYPES for f in default)

    tuned = NfcDecoder(thresholds=_impossible_nfca()).decode(samples, rate)
    assert not any(f.frame_type in GOLDEN_TYPES for f in tuned)
    assert len(tuned) > 0  # carrier events still emit


@pytest.mark.skipif(not _native_ok(), reason="native library unavailable")
def test_streaming_decode_respects_thresholds(capture):
    from nfclab.runtime.streaming import StreamingNfcDecoder

    samples, rate = capture
    dec = StreamingNfcDecoder(rate, thresholds=_impossible_nfca())
    frames = list(dec.feed(samples)) + list(dec.finish())
    assert not any(f.frame_type in GOLDEN_TYPES for f in frames)


@pytest.mark.skipif(not _native_ok(), reason="native library unavailable")
def test_preloaded_channels_respect_thresholds(capture):
    """The kernel-channel path: masks computed with custom thresholds +
    preload keyed with the same DecoderThresholds must bind (no silent
    host recompute) and produce the same frames as the plain host decode
    with those thresholds."""
    from test_tpu_channels import _host_channel_arrays

    from nfclab.core.params import SignalParams
    from nfclab.dsp.tpu_channels import preload_channels
    from nfclab.runtime.decoder import DecoderContext

    samples, rate = capture
    th = DecoderThresholds()
    th.nfca.correlation = 0.85  # stricter but not impossible
    arrs, cond = _host_channel_arrays(samples, rate, 0.01, thresholds=th)

    dec = NfcDecoder(thresholds=th)
    via_preload = dec.decode(samples, rate, tpu_channels=arrs)
    plain = NfcDecoder(thresholds=th).decode(samples, rate)
    assert via_preload == plain

    # and the preloaded index entries really were consumed: keys built by
    # idx_key_map(thresholds=th) appear in a fresh context's cache
    params = SignalParams(rate, power_level_threshold=0.01)
    ctx = DecoderContext(cond, rate, params, thresholds=th)
    preload_channels(ctx.channels, arrs, rate, 0.01, thresholds=th)
    techs = dec._make_techs(ctx)
    for te in techs:
        te.initialize()
    from nfclab.dsp.tpu_channels import idx_key_map

    for _, key, _ in idx_key_map(rate, 0.01, thresholds=th):
        assert key in ctx.channels._cache


def test_sharded_decode_respects_thresholds(capture):
    """Mesh-sharded frontend: the same threshold change flows through the
    shard_map mask math (single source of truth -> same frames)."""
    from conftest import ensure_cpu_devices

    if not _native_ok():
        pytest.skip("native library unavailable")
    ensure_cpu_devices()
    import jax

    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("need 4 virtual CPU devices")
    from nfclab.shard.multichip import decode_sharded

    samples, rate = capture
    tuned = decode_sharded(
        samples, rate, devices=devs[:4], thresholds=_impossible_nfca()
    )
    assert not any(f.frame_type in GOLDEN_TYPES for f in tuned)

    default = decode_sharded(samples, rate, devices=devs[:4])
    plain = NfcDecoder().decode(samples, rate)
    assert default == plain
