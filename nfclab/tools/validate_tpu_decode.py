"""Validate the TPU-fed decode path on real hardware: decode reference
captures with every correlator channel + detect-trigger index computed by
the fused Pallas kernel (dsp.tpu_channels) and compare the frames against
the reference ground truth (golden equality, RawFrame.cpp:82-97 semantics).

Run: python -m nfclab.tools.validate_tpu_decode [fixture ...]
Prints one OK/MISMATCH line per fixture; exits non-zero on any mismatch.

The kernel box sums carry the f32 running-sum roundoff family of the
reference's own integrators, so golden equality (not bitwise channel
equality) is the acceptance criterion — the same criterion the reference's
test-sdr harness applies to itself."""

from __future__ import annotations

import os
import sys

# small fixtures by default: the axon tunnel fetches device arrays slowly,
# and these three cover ASK poll/listen (A 106k), BPSK listen (A 424k) and
# the NFC-B falling-edge path.  ALL 18 reference fixtures have been
# validated OK through this path (run with explicit fixture names, in
# batches if the fetch tunnel is slow).
DEFAULT_FIXTURES = (
    "test_NFC-A_106kbps_002",
    "test_NFC-A_424kbps_001",
    "test_NFC-B_106kbps_001",
    # long frames crossing chunk boundaries mid-modulation: these two
    # caught the overlap-save halo's frozen-envelope non-convergence (the
    # device-conditioning path must use carried-state chunking)
    "test_NFC-A_424kbps_002",
    "test_NFC-B_106kbps_002",
)

WAV_DIR = "/root/reference/wav"


def main(argv=None) -> int:
    names = (argv or sys.argv[1:]) or list(DEFAULT_FIXTURES)

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from ..io.golden import GOLDEN_TYPES, read_golden_frames
    from ..runtime.batch import decode_batch

    paths = [os.path.join(WAV_DIR, f"{n}.wav") for n in names]

    bad = 0

    def check(results, label):
        nonlocal bad
        for name, path in zip(names, paths):
            if path not in results:
                continue
            got = [
                f for f in results[path] if f.frame_type in GOLDEN_TYPES
            ]
            want = read_golden_frames(os.path.join(WAV_DIR, f"{name}.json"))
            ok = len(got) == len(want) and all(
                a == b for a, b in zip(got, want)
            )
            print(f"TPU DECODE {label} {name}: {'OK' if ok else 'MISMATCH'}",
                  flush=True)
            if not ok:
                bad += 1
                for i, (a, b) in enumerate(zip(got, want)):
                    if a != b:
                        print(f"  first diff at frame {i}: "
                              f"got={a!r} want={b!r}")
                        break
                if len(got) != len(want):
                    print(f"  frame count: got {len(got)} want {len(want)}")

    # device channels + worker-native conditioning (the default fused mode)
    check(decode_batch(paths, workers=1, frontend="fused"), "host-cond")
    # full device frontend (conditioning fetched from the kernel too);
    # includes the boundary-crossing fixtures — kernel conditioning is
    # only exact via the carried-state chained runner
    check(
        decode_batch(
            [paths[0], *paths[3:]], workers=1, frontend="fused",
            conditioner="device",
        ),
        "device-cond",
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
