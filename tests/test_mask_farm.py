"""Mask-fed streaming decode: the farm's ``fetch="mask"`` mode.

MaskFedStream conditions natively on the host (the bit-exact f64 contract
path) and takes ONLY its detect-trigger indices from the kernel's packed
mask — 1 byte/sample over the link instead of 37.  These tests compute the
mask on CPU with the unfused JAX frontend (same bit layout as the Pallas
kernel, margined like the batch mask frontend) and assert frame equality
against the plain host streaming decoder on golden fixtures.

The TPU farm-level run (real kernel mask, fetch="mask") is covered by
tools/validate_tpu_farm in the tpu test tier.
"""

import numpy as np
import pytest

from nfclab.io.golden import GOLDEN_TYPES, read_golden_frames
from nfclab.io.wav import read_wav


def _native_ok():
    from nfclab.native.binding import native_available

    return native_available()


pytestmark = pytest.mark.skipif(
    not _native_ok(), reason="mask-fed streaming requires the native library"
)


def _cpu_mask(samples, rate, power_thr=0.01, thresholds=None):
    """Packed detect mask for one capture, computed on CPU by the unfused
    JAX frontend with the batch mask frontend's conservative margin."""
    from conftest import ensure_cpu_devices

    ensure_cpu_devices()
    import jax

    from nfclab.core.params import SignalParams
    from nfclab.dsp.frontend import make_frontend
    from nfclab.dsp.pallas.fused_frontend import MASK_LAYOUT
    from nfclab.dsp.tpu_channels import MASK_ONLY_MARGIN
    from nfclab.core.thresholds import DecoderThresholds

    d = thresholds or DecoderThresholds()
    m = 1.0 - MASK_ONLY_MARGIN
    thr = {
        "nfca": d.nfca.correlation * m,
        "nfcb": d.nfcb.min_modulation_deep,
        "nfcf": d.nfcf.correlation * m,
        "nfcv": d.nfcv.correlation * m,
    }
    params = SignalParams(rate, power_level_threshold=power_thr)
    fe = jax.jit(make_frontend(params, corr_thresholds=thr))
    x = np.asarray(samples, np.float32)
    pad = (-len(x)) % 256  # the scan path wants a multiple of its unroll
    if pad:
        x = np.concatenate([x, np.zeros(pad, np.float32)])
    res = fe(x[None, :])
    mask = np.zeros(len(samples), np.uint8)
    for name, w in MASK_LAYOUT:
        mask |= np.where(np.asarray(res[name][0][: len(samples)]), np.uint8(w), np.uint8(0))
    return mask


def _mask_stream(samples, rate, mask, window=None, block=65536, slack=2,
                 **kw):
    from nfclab.runtime.farm import MaskFedStream

    dec = MaskFedStream(rate, window=window, slack=slack, **kw)
    frames = []
    for off in range(0, len(samples), block):
        frames.extend(
            dec.feed_mask(samples[off : off + block],
                          mask[off : off + block])
        )
    frames.extend(dec.finish())
    return dec, frames


@pytest.mark.parametrize(
    "name",
    ["test_NFC-A_106kbps_002", "test_POLL_AB_001"],
)
def test_mask_fed_stream_matches_golden(fixture_dir, name):
    samples, info = read_wav(str(fixture_dir / f"{name}.wav"))
    mask = _cpu_mask(samples, info.sample_rate)
    _, frames = _mask_stream(samples, info.sample_rate, mask)
    got = [f for f in frames if f.frame_type in GOLDEN_TYPES]
    want = read_golden_frames(str(fixture_dir / f"{name}.json"))
    assert got == want


def test_mask_fed_stream_windowed(fixture_dir):
    """Window compaction shifts the injected index entries with the other
    cache entries (LazyChannels.rebind generic path): tiled capture long
    enough to force compactions, windowed vs unbounded frame equality."""
    name = "test_NFC-A_106kbps_002"
    samples, info = read_wav(str(fixture_dir / f"{name}.wav"))
    big = np.tile(samples, 12)
    mask = _cpu_mask(big, info.sample_rate)
    dec, frames = _mask_stream(big, info.sample_rate, mask, window=1 << 18)
    assert dec.base > 0, "window never compacted; test is vacuous"
    _, ref_frames = _mask_stream(big, info.sample_rate, mask)
    assert frames == ref_frames
    got = [f for f in ref_frames if f.frame_type in GOLDEN_TYPES]
    assert len(got) >= 12  # the tiled capture decodes in every repetition


def test_mask_fed_stream_sparse_indices(fixture_dir):
    """feed_mask_idx (the device-compacted O(triggers) form) must decode
    identically to the dense feed_mask path on the same mask."""
    from nfclab.runtime.farm import MaskFedStream

    name = "test_NFC-A_106kbps_002"
    samples, info = read_wav(str(fixture_dir / f"{name}.wav"))
    mask = _cpu_mask(samples, info.sample_rate)
    _, dense_frames = _mask_stream(samples, info.sample_rate, mask)

    dec = MaskFedStream(info.sample_rate)
    sparse_frames = []
    for off in range(0, len(samples), 65536):
        seg = mask[off : off + 65536]
        rel = np.flatnonzero(seg).astype(np.int64)
        sparse_frames.extend(
            dec.feed_mask_idx(samples[off : off + 65536], rel, seg[rel])
        )
    sparse_frames.extend(dec.finish())
    assert sparse_frames == dense_frames
    assert [f for f in sparse_frames if f.frame_type in GOLDEN_TYPES]


@pytest.mark.parametrize("walk_threads", [None, 2])
def test_pipelined_farm_mask_mode(fixture_dir, monkeypatch, walk_threads):
    """TpuStreamFarm fetch='mask' pipeline plumbing on CPU: staging into
    k_chunks windows, background dispatch ordering, compacted-index walk,
    pow2 + host-tail flush at finish — with run_chained_masks stubbed by a
    host-computed mask oracle.  Frames must equal the plain host streaming
    decoder per stream (including a deliberately ragged final feed)."""
    import nfclab.dsp.tpu_channels as tc
    from nfclab.runtime.farm import TpuStreamFarm
    from nfclab.runtime.streaming import StreamingNfcDecoder

    names = ["test_NFC-A_106kbps_002", "test_NFC-B_106kbps_001"]
    sigs, rate = [], None
    for n in names:
        s, info = read_wav(str(fixture_dir / f"{n}.wav"))
        rate = info.sample_rate
        sigs.append(np.asarray(s, np.float32))
    total = min(len(s) for s in sigs) // 512 * 512
    sigs = [s[:total] for s in sigs]
    masks = [_cpu_mask(s, rate) for s in sigs]

    clock = {"t": 0}

    def fake_run(blocks, state, base0, pt, mp, cap_div=8, chunk=65536,
                 sample_rate=10_000_000):
        lo = clock["t"]
        T = blocks.shape[1]
        out = []
        for i in range(blocks.shape[0]):
            seg = masks[i][lo : lo + T]
            np.testing.assert_array_equal(blocks[i], sigs[i][lo : lo + T])
            rel = np.flatnonzero(seg).astype(np.int64)
            out.append((rel, seg[rel]))
        clock["t"] = lo + T
        return out, state

    monkeypatch.setattr(tc, "run_chained_masks", fake_run)
    monkeypatch.setattr(tc, "chain_state0", lambda *a, **k: object())

    farm = TpuStreamFarm(2, rate, fetch="mask", k_chunks=4,
                         walk_threads=walk_threads, segments=1)
    frames = [[] for _ in sigs]
    step = 40960  # deliberately NOT the chain chunk size (but % 512 == 0)
    block = np.empty((2, step), np.float32)  # REUSED buffer: the farm
    for off in range(0, total, step):       # must copy at staging
        w = min(step, total - off)
        for i, s in enumerate(sigs):
            block[i, :w] = s[off : off + w]
        for i, new in enumerate(farm.feed(block[:, :w])):
            frames[i].extend(new)
    for i, new in enumerate(farm.finish()):
        frames[i].extend(new)

    for i, s in enumerate(sigs):
        host = StreamingNfcDecoder(rate)
        want = []
        for off in range(0, total, 65536):
            want.extend(host.feed(s[off : off + 65536]))
        want.extend(host.finish())
        assert frames[i] == want, names[i]
        assert [f for f in frames[i] if f.frame_type in GOLDEN_TYPES]


def test_pipelined_farm_segmented_plumbing(fixture_dir, monkeypatch):
    """The segment-parallel farm branch on CPU with stubbed engines: the
    FIRST full window runs the serial chain (true stream-head seeding)
    and hands off a carry, subsequent full windows go through
    run_segmented_masks with the previous window's last chunk as the tail
    and the carried end state threading in submission order, and the
    finish() flush falls back to the serial chain.  Frames must equal the
    plain host streaming decoder."""
    import nfclab.dsp.tpu_channels as tc
    from nfclab.runtime.farm import TpuStreamFarm
    from nfclab.runtime.streaming import StreamingNfcDecoder

    names = ["test_NFC-A_106kbps_002", "test_NFC-B_106kbps_001"]
    sigs, rate = [], None
    for n in names:
        s, info = read_wav(str(fixture_dir / f"{n}.wav"))
        rate = info.sample_rate
        # tile to >= 3 full k_chunks=4 windows so the segmented branch
        # runs at least twice after the serial head window
        reps = -(-(3 * 4 * 65536 + 65536) // len(s))
        sigs.append(np.tile(np.asarray(s, np.float32), reps))
    total = min(len(s) for s in sigs) // 512 * 512
    sigs = [s[:total] for s in sigs]
    masks = [_cpu_mask(s, rate) for s in sigs]

    clock = {"t": 0}
    calls = {"serial": 0, "seg": 0}

    def oracle(lo, blocks):
        T = blocks.shape[1]
        out = []
        for i in range(blocks.shape[0]):
            seg_m = masks[i][lo : lo + T]
            np.testing.assert_array_equal(blocks[i], sigs[i][lo : lo + T])
            rel = np.flatnonzero(seg_m).astype(np.int64)
            out.append((rel, seg_m[rel]))
        return out

    def fake_run(blocks, state, base0, pt, mp, cap_div=8, chunk=65536,
                 sample_rate=10_000_000, want_carry=False):
        lo = clock["t"]
        out = oracle(lo, blocks)
        clock["t"] = lo + blocks.shape[1]
        calls["serial"] += 1
        if want_carry:
            n = blocks.shape[0]
            return out, state, {
                "pen": np.full((n, 3), clock["t"] - chunk, np.float32),
                "end": np.full((n, 3), clock["t"], np.float32),
            }
        return out, state

    def fake_seg(blocks, carry, pt, mp, segments, cap_div=16, chunk=65536,
                 sample_rate=10_000_000, k_bucket=32):
        lo = clock["t"]
        assert segments == 2
        # carry threading: the tail is the previous window's last chunk,
        # the end state is the previous dispatch's end
        np.testing.assert_array_equal(
            carry["tail"], np.stack([s[lo - chunk : lo] for s in sigs])
        )
        assert float(carry["end"][0, 0]) == lo
        assert float(carry["pen"][0, 0]) == lo - chunk
        out = oracle(lo, blocks)
        clock["t"] = lo + blocks.shape[1]
        calls["seg"] += 1
        n = blocks.shape[0]
        new_carry = {
            "pen": np.full((n, 3), clock["t"] - chunk, np.float32),
            "end": np.full((n, 3), clock["t"], np.float32),
            "tail": blocks[:, -chunk:].copy(),
        }
        return out, new_carry, {"repaired_streams": 0, "repair_chunks": 0}

    monkeypatch.setattr(tc, "run_chained_masks", fake_run)
    monkeypatch.setattr(tc, "run_segmented_masks", fake_seg)
    monkeypatch.setattr(tc, "chain_state0", lambda *a, **k: object())
    monkeypatch.setattr(tc, "_expand_state",
                        lambda n: (lambda rows: object()))

    farm = TpuStreamFarm(2, rate, fetch="mask", k_chunks=4)
    assert farm.segments == 2  # auto: largest pow2 <= k_chunks/2 (<= 16)
    frames = [[] for _ in sigs]
    step = 40960
    for off in range(0, total, step):
        w = min(step, total - off)
        block = np.stack([s[off : off + w] for s in sigs])
        for i, new in enumerate(farm.feed(block)):
            frames[i].extend(new)
    for i, new in enumerate(farm.finish()):
        frames[i].extend(new)

    assert calls["serial"] >= 1 and calls["seg"] >= 2
    assert farm.stats["seg_dispatches"] == calls["seg"]
    assert farm.stats["seg_backoff_windows"] == 0  # no repairs reported

    for i, s in enumerate(sigs):
        host = StreamingNfcDecoder(rate)
        want = []
        for off in range(0, total, 65536):
            want.extend(host.feed(s[off : off + 65536]))
        want.extend(host.finish())
        assert frames[i] == want, names[i]
        assert [f for f in frames[i] if f.frame_type in GOLDEN_TYPES]


def test_pipelined_farm_segmented_backoff(fixture_dir, monkeypatch):
    """Adaptive backoff: when a segmented window repairs most streams
    (pause-heavy traffic), subsequent full windows run the serial chain
    and the farm re-probes with exponential spacing — the steady state is
    serial-engine behavior plus a bounded probe overhead."""
    import nfclab.dsp.tpu_channels as tc
    from nfclab.runtime.farm import TpuStreamFarm

    s, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_002.wav"))
    rate = info.sample_rate
    reps = -(-(8 * 4 * 65536 + 65536) // len(s))
    sig = np.tile(np.asarray(s, np.float32), reps)
    total = len(sig) // 512 * 512
    sig = sig[:total]
    mask = _cpu_mask(sig, rate)
    sigs = [sig, sig]

    clock = {"t": 0}
    calls = {"serial": 0, "seg": 0}

    def oracle(lo, blocks):
        T = blocks.shape[1]
        return [
            (np.flatnonzero(mask[lo : lo + T]).astype(np.int64),
             mask[lo : lo + T][np.flatnonzero(mask[lo : lo + T])])
            for _ in range(blocks.shape[0])
        ]

    def fake_run(blocks, state, base0, pt, mp, cap_div=8, chunk=65536,
                 sample_rate=10_000_000, want_carry=False):
        lo = clock["t"]
        out = oracle(lo, blocks)
        clock["t"] = lo + blocks.shape[1]
        calls["serial"] += 1
        if want_carry:
            n = blocks.shape[0]
            return out, state, {"pen": np.zeros((n, 3), np.float32),
                                "end": np.zeros((n, 3), np.float32)}
        return out, state

    def fake_seg(blocks, carry, pt, mp, segments, cap_div=16, chunk=65536,
                 sample_rate=10_000_000, k_bucket=32):
        lo = clock["t"]
        out = oracle(lo, blocks)
        clock["t"] = lo + blocks.shape[1]
        calls["seg"] += 1
        n = blocks.shape[0]
        new_carry = {"pen": np.zeros((n, 3), np.float32),
                     "end": np.zeros((n, 3), np.float32),
                     "tail": blocks[:, -chunk:].copy()}
        # every stream verify-fails (a pause spans the boundaries)
        return out, new_carry, {"repaired_streams": n,
                                "repair_chunks": n * 4}

    monkeypatch.setattr(tc, "run_chained_masks", fake_run)
    monkeypatch.setattr(tc, "run_segmented_masks", fake_seg)
    monkeypatch.setattr(tc, "chain_state0", lambda *a, **k: object())
    monkeypatch.setattr(tc, "_expand_state",
                        lambda n: (lambda rows: object()))

    farm = TpuStreamFarm(2, rate, fetch="mask", k_chunks=4)
    assert farm.segments == 2
    for off in range(0, total, 65536):
        farm.feed(np.stack([x[off : off + 65536] for x in sigs]))
    farm.finish()

    # window 1 serial (head), window 2 the probe (full repairs), then
    # backoff: the remaining full windows run serial
    assert calls["seg"] == 1
    assert farm.stats["seg_backoff_windows"] >= 2
    assert farm.stats["repaired_streams"] == 2


def test_mask_fed_stream_custom_thresholds(fixture_dir):
    """The kernel mask carries the MARGINED custom thresholds while the
    walk re-checks against the true ones (single source of truth): a
    raised NFC-A correlation threshold must change frames identically on
    the host path and the mask-fed path."""
    from nfclab.core.thresholds import DecoderThresholds
    from nfclab.runtime.streaming import StreamingNfcDecoder

    name = "test_NFC-A_106kbps_002"
    samples, info = read_wav(str(fixture_dir / f"{name}.wav"))
    th = DecoderThresholds()
    th.nfca.correlation = 0.60  # away from the 0.75 default

    host = StreamingNfcDecoder(info.sample_rate, thresholds=th.copy())
    host_frames = []
    for off in range(0, len(samples), 65536):
        host_frames.extend(host.feed(samples[off : off + 65536]))
    host_frames.extend(host.finish())

    mask = _cpu_mask(samples, info.sample_rate, thresholds=th)
    _, mask_frames = _mask_stream(
        samples, info.sample_rate, mask, thresholds=th.copy()
    )
    assert mask_frames == host_frames
    assert [f for f in mask_frames if f.frame_type in GOLDEN_TYPES]
