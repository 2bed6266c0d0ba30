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
