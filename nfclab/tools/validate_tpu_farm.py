"""Validate the TPU stream farm on real hardware: several reference
captures decode CONCURRENTLY as rows of one chunked device batch (carried
kernel state across chunks), and every stream's frames must match the
reference ground truth.

Run: python -m nfclab.tools.validate_tpu_farm [fixture ...]
Prints one OK/MISMATCH line per stream; exits non-zero on any mismatch."""

from __future__ import annotations

import os
import sys

import numpy as np

DEFAULT_FIXTURES = (
    "test_NFC-A_106kbps_002",
    "test_NFC-A_424kbps_001",
    "test_NFC-B_106kbps_001",
    "test_POLL_AB_001",
)

WAV_DIR = "/root/reference/wav"
CHUNK = 65536


def main(argv=None) -> int:
    names = (argv or sys.argv[1:]) or list(DEFAULT_FIXTURES)

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from ..io.golden import GOLDEN_TYPES, read_golden_frames
    from ..io.wav import read_wav
    from ..runtime.farm import TpuStreamFarm

    streams = []
    for n in names:
        samples, info = read_wav(os.path.join(WAV_DIR, f"{n}.wav"))
        assert info.sample_rate == 10_000_000
        streams.append(np.asarray(samples, np.float32))

    window = int(os.environ.get("NFCLAB_FARM_WINDOW", "0")) or None
    modes = os.environ.get("NFCLAB_FARM_MODES", "full,mask").split(",")
    longest = max(len(s) for s in streams)
    total = -(-longest // CHUNK) * CHUNK

    bad = 0
    for fetch in modes:
        farm = TpuStreamFarm(len(streams), window=window, fetch=fetch)
        frames = [[] for _ in streams]
        for lo in range(0, total, CHUNK):
            block = np.zeros((len(streams), CHUNK), np.float32)
            for i, s in enumerate(streams):
                seg = s[lo : lo + CHUNK]
                block[i, : len(seg)] = seg
            for i, new in enumerate(farm.feed(block)):
                frames[i].extend(new)
        for i, new in enumerate(farm.finish()):
            frames[i].extend(new)

        for i, name in enumerate(names):
            got = [f for f in frames[i] if f.frame_type in GOLDEN_TYPES]
            want = read_golden_frames(os.path.join(WAV_DIR, f"{name}.json"))
            ok = len(got) == len(want) and all(
                a == b for a, b in zip(got, want)
            )
            print(
                f"TPU FARM [{fetch}] stream {i} {name}: "
                f"{'OK' if ok else 'MISMATCH'}",
                flush=True,
            )
            if not ok:
                bad += 1
                print(f"  frames: got {len(got)} want {len(want)}")
                for j, (a, b) in enumerate(zip(got, want)):
                    if a != b:
                        print(f"  first diff at {j}: got={a!r} want={b!r}")
                        break
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
