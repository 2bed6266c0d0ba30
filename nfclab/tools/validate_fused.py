"""On-TPU validation of the fused Pallas frontend.

Compares the fused kernel (dsp/pallas/fused_frontend) against the unfused
XLA frontend (dsp/frontend.make_frontend) on random bursty input:

- conditioning outputs (envelope/filtered/deviation/average/mod_depth) must
  be bit-exact;
- NFC-A detect masks may differ only within the documented f32 running-sum
  roundoff family (box integrators accumulate in f32 like the reference's
  own ring integrators, the XLA path derives boxes from a cumsum) — bounded
  at 1e-4 of bits.

Exit code 0 = pass.  Run standalone (needs the TPU; tests invoke it via
subprocess because the pytest session pins JAX to CPU).
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main() -> int:
    os.makedirs(".jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if jax.devices()[0].platform == "cpu":
        print("SKIP: no TPU device")
        return 0

    from nfclab.core.params import SignalParams
    from nfclab.dsp.frontend import make_frontend, make_fused_frontend

    params = SignalParams(10_000_000)
    rng = np.random.default_rng(42)
    B, T = 2048, 4096  # B % 2048 == 0 exercises the sub=16 tile path
    x = (rng.random((B, T), dtype=np.float32) * 0.4 + 0.01).astype(np.float32)
    x[:, 1000:1100] *= 0.05
    x[:, 2000:2100] *= 0.3

    ref = jax.jit(make_frontend(params))(x)
    fused = make_fused_frontend(params, native_layout=False)(x)

    failures = []
    for name in ("envelope", "filtered", "deviation", "average", "mod_depth"):
        a = np.asarray(ref[name])
        b = np.asarray(fused[name])
        if not np.array_equal(a, b, equal_nan=True):
            failures.append(f"{name}: not bit-exact "
                            f"(maxdiff {np.nanmax(np.abs(a - b)):.3e})")
        else:
            print(f"{name}: bit-exact")

    from nfclab.dsp.pallas.fused_frontend import MASK_LAYOUT

    packed = np.asarray(fused["detect_mask"]).astype(np.int32)
    for name, w in MASK_LAYOUT:
        a = np.asarray(ref[name]).astype(bool)
        b = (packed & w) != 0
        diff = int(np.sum(a != b))
        frac = diff / a.size
        print(f"{name}: {diff}/{a.size} bits differ ({frac:.2e})")
        if frac > 1e-4:
            failures.append(f"{name}: {frac:.2e} of bits differ (>1e-4)")

    # chunked streaming must be bit-identical to the monolithic pass
    from nfclab.dsp.frontend import _params_tuple
    from nfclab.dsp.pallas.fused_frontend import fused_frontend_stream

    OUT_CHECK = (
        "envelope", "filtered", "average", "bv12", "bv94", "q47", "q189",
        "p24x6", "p94x24", "detect_mask",
    )
    from nfclab.core.thresholds import DecoderThresholds

    mp = DecoderThresholds().detect_mask_tuple(
        params.power_level_threshold
    )
    for name in OUT_CHECK:
        pieces = []
        for off, res in fused_frontend_stream(
            x, _params_tuple(params), chunk=1024, mask_params=mp
        ):
            pieces.append(np.asarray(res[name]))
        chunked = np.concatenate(pieces, axis=1)
        whole = np.asarray(fused[name])
        if np.array_equal(chunked, whole, equal_nan=True):
            print(f"chunked {name}: bit-exact")
        else:
            failures.append(
                f"chunked {name}: differs from monolithic pass "
                f"(maxdiff {np.nanmax(np.abs(chunked - whole)):.3e})"
            )

    if failures:
        print("FAIL:")
        for f in failures:
            print(" -", f)
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
