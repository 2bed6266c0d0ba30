"""JAX block-parallel conditioner vs the native sequential oracle."""

import numpy as np
import pytest

from nfclab.core.params import SignalParams


def _ulp_distance(a: np.ndarray, b: np.ndarray) -> int:
    ia = a.view(np.int32).astype(np.int64)
    ib = b.view(np.int32).astype(np.int64)
    # map to monotonic integer ordering of floats
    ia = np.where(ia < 0, np.int64(-(1 << 31)) - ia, ia)
    ib = np.where(ib < 0, np.int64(-(1 << 31)) - ib, ib)
    return int(np.max(np.abs(ia - ib), initial=0))


def _compare(x, sp, **kw):
    """On TPU the block-parallel conditioner is bit-identical to the C++
    oracle (verified on every bundled fixture).  The XLA *CPU* backend
    contracts multiply-adds into FMAs inside the scan, so on CPU a 2-ulp
    tolerance is allowed on the EMA chains."""
    import jax

    from nfclab.dsp.conditioner import condition_jax
    from nfclab.native import condition_exact

    exact_platform = jax.devices()[0].platform != "cpu"
    a = condition_exact(x, sp)
    b = condition_jax(x, sp, **kw)
    for name in (
        "envelope",
        "filtered",
        "deviation",
        "average",
        "mod_depth",
        "edge_peak",
        "edge_time",
    ):
        va, vb = getattr(a, name), getattr(b, name)
        if exact_platform or name in ("edge_time",):
            assert np.array_equal(va, vb, equal_nan=True), (
                f"{name}: {np.sum(va != vb)} diffs"
            )
        else:
            m = np.isfinite(va) & np.isfinite(vb)
            np.testing.assert_allclose(
                va[m], vb[m], rtol=1e-4, atol=1e-6, err_msg=name
            )


def test_conditioner_bit_exact_fixture(fixture_dir):
    from tests.conftest import ensure_cpu_devices

    ensure_cpu_devices()
    from nfclab.io.wav import read_wav

    x, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    _compare(x, SignalParams(info.sample_rate))


def test_conditioner_repair_path():
    """Synthetic carrier-off stretch long enough to defeat the halo: forces
    the boundary-repair path (non-convergent envelope memory)."""
    from tests.conftest import ensure_cpu_devices

    ensure_cpu_devices()
    rng = np.random.default_rng(1)
    n = 300_000
    x = np.zeros(n, np.float32)
    # carrier on for 50k, off (noise) for 200k, on again
    x[:50_000] = 0.35 + 0.01 * rng.standard_normal(50_000)
    x[50_000:250_000] = 0.002 * rng.standard_normal(200_000)
    x[250_000:] = 0.35 + 0.01 * rng.standard_normal(n - 250_000)
    x = x.astype(np.float32)
    _compare(x, SignalParams(10_000_000), block=32768, halo=8192)


def test_box_multi_ext_bit_identical():
    """The fused multi-channel box extender must produce bit-identical
    arrays and carries to the per-channel _ext kernels, including when
    channels extend from different start clocks."""
    import numpy as np

    from nfclab.native import binding

    if not binding.native_available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    n = 50_000
    value = (rng.random(n, np.float32) * 0.4).astype(np.float32)
    filt = (rng.random(n, np.float32) - 0.5).astype(np.float32) * 0.2

    # (kind_code, width, lag): sum(value), sq(filt), bpsk(filt, lag)
    specs = [(0, 37, 0), (0, 512, 0), (1, 64, 0), (1, 300, 0),
             (2, 128, 47), (2, 96, 200)]
    kinds = {0: "sum", 1: "sq", 2: "bpsk"}

    # reference: per-channel extension in two chunks
    ref = []
    for kind, w, lag in specs:
        acc = np.zeros(1, np.float64)
        out = np.zeros(n, np.float32)
        src = value if kind == 0 else filt
        binding.box_ext_native(kinds[kind], src, 0, 30_000, w, lag, acc, out)
        binding.box_ext_native(kinds[kind], src, 30_000, n, w, lag, acc, out)
        ref.append((acc.copy(), out))

    # fused: same two chunks, all channels at once, plus a staggered start
    # for one channel (extends alone first, then joins the fused pass)
    accs = [np.zeros(1, np.float64) for _ in specs]
    outs = [np.zeros(n, np.float32) for _ in specs]
    binding.box_ext_native(
        kinds[specs[0][0]], value, 0, 10_000, specs[0][1], specs[0][2],
        accs[0], outs[0],
    )
    starts = [10_000] + [0] * (len(specs) - 1)
    jobs = [
        (k, w, lag, starts[i], accs[i], outs[i])
        for i, (k, w, lag) in enumerate(specs)
    ]
    binding.box_multi_ext_native(value, filt, 30_000, 0, jobs)
    jobs = [(k, w, lag, 30_000, accs[i], outs[i])
            for i, (k, w, lag) in enumerate(specs)]
    binding.box_multi_ext_native(value, filt, n, 0, jobs)

    for i in range(len(specs)):
        assert np.array_equal(ref[i][1], outs[i]), f"channel {i} diverged"
        assert ref[i][0][0] == accs[i][0], f"carry {i} diverged"
