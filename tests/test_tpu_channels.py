"""TPU-fed channel preload plumbing (CPU-side): the cache keys built by
dsp.tpu_channels.preload_channels must be exactly the keys the tech FSMs'
bind_channels request, and a decode fed with (host-computed) preloaded
channels must produce identical frames to the default path.

The real-kernel end-to-end check runs on TPU via
tools/validate_tpu_decode (opt-in test in test_fused_frontend.py)."""

import numpy as np
import pytest

from nfclab.core.params import nfca_bitrates
from nfclab.dsp.tpu_channels import _BOX_KEYS, preload_channels
from nfclab.io.golden import GOLDEN_TYPES
from nfclab.io.wav import read_wav
from nfclab.runtime.decoder import DecoderContext, NfcDecoder


def _native_ok():
    from nfclab.native.binding import native_available

    return native_available()


pytestmark = pytest.mark.skipif(
    not _native_ok(), reason="native library unavailable"
)


def _host_channel_arrays(samples, rate, power_thr, thresholds=None):
    """Compute the same channel set the fused kernel outputs, on the host
    (f64 carries), keyed by kernel output names.  `thresholds` drives the
    detect-trigger mask exactly like the kernel's mask_params."""
    from nfclab.core.params import SignalParams
    from nfclab.core.thresholds import DecoderThresholds
    from nfclab.demod.nfcv import nfcv_bitrate
    from nfclab.dsp.pallas.fused_frontend import MASK_LAYOUT
    from nfclab.native import condition_exact

    th = thresholds or DecoderThresholds()
    params = SignalParams(rate, power_level_threshold=power_thr)
    cond = condition_exact(samples, params)
    ctx = DecoderContext(cond, rate, params, thresholds=th)
    lz = ctx.channels
    n = len(samples)

    arrs = {}
    for name, (key, kind, width, lag) in _BOX_KEYS.items():
        if key[0] == "bv":
            arrs[name] = np.asarray(lz.box_value(width))[:n].copy()
        elif key[0] == "bq":
            arrs[name] = np.asarray(lz.box_sq(width))[:n].copy()
        else:
            arrs[name] = np.asarray(lz.box_bpsk(lag, width))[:n].copy()

    weights = dict(MASK_LAYOUT)
    bits = np.zeros(n, np.int32)
    pw = float(power_thr)
    for r, br in enumerate(nfca_bitrates(rate)):
        idx = lz.detect_idx(br.symbol_delay_detect, br.period1, br.period2,
                            float(np.float32(th.nfca.correlation)), pw)
        bits[idx] |= weights[f"mask_a_{r}"]
    for br, mname in zip(nfca_bitrates(rate)[:2], ("mask_b_0", "mask_b_94")):
        idx = lz.edge_idx_b(
            br.symbol_delay_detect,
            float(np.float32(th.nfcb.min_modulation_deep)), pw,
        )
        bits[idx] |= weights[mname]
    for br, mname in zip(nfca_bitrates(rate)[1:], ("mask_f_1", "mask_f_2")):
        idx = lz.detect_idx(0, br.period1, br.period2,
                            float(np.float32(th.nfcf.correlation)), pw)
        bits[idx] |= weights[mname]
    brv = nfcv_bitrate(rate)
    idx = lz.detect_idx(brv.symbol_delay_detect, brv.period1, brv.period2,
                        float(np.float32(th.nfcv.correlation)), pw,
                        signed_v=True)
    bits[idx] |= weights["mask_v"]
    arrs["detect_mask"] = bits.astype(np.float32)
    return arrs, cond


def test_mask_only_preload_decode_matches(fixture_dir):
    """The mask-only frontend (1 byte/sample off-device): preloading JUST
    the detect mask must decode identically to the plain host path — box
    channels and conditioning build natively, the trigger indices come
    from the mask bits."""
    samples, info = read_wav(str(fixture_dir / "test_POLL_AB_001.wav"))
    rate = info.sample_rate
    arrs, cond = _host_channel_arrays(samples, rate, 0.01)
    mask_only = {"detect_mask": arrs["detect_mask"]}
    got = NfcDecoder().decode(samples, rate, tpu_channels=mask_only)
    want = NfcDecoder().decode(samples, rate)
    assert got == want


def test_preload_keys_bind_without_recompute(fixture_dir):
    """Every box channel and detect-index set a tech binds must be served
    from the preloaded cache (shared memory proves no host recompute)."""
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_002.wav"))
    rate = info.sample_rate
    arrs, cond = _host_channel_arrays(samples, rate, 0.01)

    from nfclab.core.params import SignalParams

    params = SignalParams(rate, power_level_threshold=0.01)
    ctx = DecoderContext(cond, rate, params)
    preload_channels(ctx.channels, arrs, rate, 0.01)
    n_entries = len(ctx.channels._cache)

    dec = NfcDecoder()
    techs = dec._make_techs(ctx)
    for te in techs:
        te.initialize()

    by_name = {type(te).__name__: te for te in techs}
    a = by_name["NfcATech"]
    for box, name in zip(a._box, ("bv47", "bv24", "bv12")):
        assert np.shares_memory(box, arrs[name])
    f = by_name["NfcFTech"]
    for box, name in zip(f._box, ("bv24", "bv12")):
        assert np.shares_memory(box, arrs[name])
    assert np.shares_memory(by_name["NfcVTech"]._box, arrs["bv94"])

    # detect-index sets bound by the techs are the preloaded arrays
    for te, k in ((a, 3), (by_name["NfcBTech"], 2), (f, 2)):
        for idx in te._mask_idx:
            assert idx.dtype == np.int64
    # no preloaded box/idx entry was recomputed or duplicated: the non-lazy
    # entries are exactly the ones preload created
    recomputed = [
        key for key, ent in ctx.channels._cache.items()
        if isinstance(ent, dict) and ent.get("kind") == "box"
        and not any(key == bk for bk, *_ in
                    [(v[0],) for v in _BOX_KEYS.values()])
    ]
    assert not recomputed


def test_preloaded_decode_frames_match_default(fixture_dir):
    """Decode with preloaded (host-equal) channels == default decode."""
    for name in ("test_NFC-A_106kbps_002", "test_NFC-B_106kbps_001"):
        samples, info = read_wav(str(fixture_dir / f"{name}.wav"))
        rate = info.sample_rate
        arrs, cond = _host_channel_arrays(samples, rate, 0.01)

        base = NfcDecoder().decode(samples, rate)
        fed = NfcDecoder().decode(samples, rate, tpu_channels=arrs)
        base = [f for f in base if f.frame_type in GOLDEN_TYPES]
        fed = [f for f in fed if f.frame_type in GOLDEN_TYPES]
        assert len(base) == len(fed) and all(
            x == y for x, y in zip(base, fed)
        ), name


def test_preload_covers_detect_indices(fixture_dir):
    """The detect-index keys idx_key_map emits must round-trip EXACTLY as
    the tech FSMs build them (thresholds pass through np.float32, so keying
    them as python floats silently misses and the host recomputes every
    detect channel — the bug this guards).  Spy on the lazy index getter
    and assert zero sdidx/eidxb computations on a preloaded decode."""
    import nfclab.dsp.channels as chmod
    from nfclab.runtime.decoder import walk
    from nfclab.runtime.decoder import CarrierDetector

    samples, info = read_wav(str(fixture_dir / "test_POLL_AB_001.wav"))
    rate = info.sample_rate
    arrs, cond = _host_channel_arrays(samples, rate, 0.01)

    from nfclab.core.params import SignalParams

    params = SignalParams(rate, power_level_threshold=0.01)
    ctx = DecoderContext(cond, rate, params)
    preload_channels(ctx.channels, arrs, rate, 0.01)

    computed = []
    orig = chmod.LazyChannels._idx_chan

    def spy(self, key, *a, **k):
        ent = self._cache.get(key)
        if ent is None or ent.get("idx") is None or (
            ent.get("scanned", 0) < self.n
        ):
            computed.append(key)
        return orig(self, key, *a, **k)

    chmod.LazyChannels._idx_chan = spy
    try:
        dec = NfcDecoder()
        carrier = CarrierDetector(ctx)
        techs = dec._make_techs(ctx)
        for te in techs:
            te.initialize()
        walk(ctx, carrier, techs, 0)
    finally:
        chmod.LazyChannels._idx_chan = orig
    missed = [k for k in computed if k[0] in ("sdidx", "eidxb")]
    assert not missed, f"preload missed detect-index keys: {missed}"
