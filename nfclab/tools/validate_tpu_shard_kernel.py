"""Validate the kernel-inside-shard_map multi-chip frontend on hardware.

``shard/multichip.sharded_kernel_channels`` runs the production fused
Pallas kernel inside ``shard_map`` (per-device LANES-padded windows, halos
over ppermute) — the real multi-chip hot path.  This tool asserts, on the
attached chip(s):

1. bit-exact channel equality vs the single-device overlap-save path
   (dsp.tpu_channels.fused_capture_channels) on a real capture, and
2. golden frame equality when the host walk consumes the sharded-kernel
   channels (RawFrame.cpp:82-97 semantics).

Run: python -m nfclab.tools.validate_tpu_shard_kernel [fixture ...]
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    import numpy as np

    from nfclab.dsp.tpu_channels import fused_capture_channels
    from nfclab.io.golden import GOLDEN_TYPES, read_golden_frames
    from nfclab.io.wav import read_wav
    from nfclab.runtime.decoder import NfcDecoder
    from nfclab.shard.multichip import sharded_kernel_channels

    names = (argv if argv else sys.argv[1:]) or [
        "test_NFC-A_106kbps_002", "test_POLL_AB_001",
    ]
    fixture_dir = "/root/reference/wav"
    for name in names:
        samples, info = read_wav(f"{fixture_dir}/{name}.wav")
        ref = fused_capture_channels(samples, info.sample_rate)
        got = sharded_kernel_channels(samples, info.sample_rate)
        assert set(got) == set(ref), (sorted(got), sorted(ref))
        for k in ref:
            np.testing.assert_array_equal(
                got[k], ref[k], err_msg=f"{name}:{k}"
            )
        frames = NfcDecoder().decode(
            samples, info.sample_rate, tpu_channels=got
        )
        want = read_golden_frames(f"{fixture_dir}/{name}.json")
        have = [f for f in frames if f.frame_type in GOLDEN_TYPES]
        assert have == want, f"{name}: frames diverge"
        print(f"{name}: kernel-in-shard_map channels bit-exact, "
              f"{len(want)} golden frames OK")
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
