"""Subprocess body for the two-process distributed golden-decode test.

Each of the two processes owns 4 virtual CPU devices; jax.distributed
joins them into one 8-device world (gloo cross-process collectives), the
host-major ``blocks`` mesh from shard/launch.py spans both processes, and
the sharded channel step's halo ppermute crosses the process boundary.
Every process then runs the host event walk over the all-gathered
channels and checks the frames against the golden JSON — proving the
distributed layer produces golden frames, not just a forward step.

argv: <process_id> <coordinator_port> <wav_path> <golden_json>
"""

import os
import sys


def main() -> int:
    pid, port, wav_path, golden_path = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # the axon sitecustomize pins jax_platforms to the TPU plugin; override
    # BEFORE any backend use (CLAUDE.md env notes)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from nfclab.shard.launch import global_devices_host_major, initialize

    got_pid = initialize(
        f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert got_pid == pid
    assert jax.process_count() == 2, jax.process_count()
    devs = global_devices_host_major()
    assert len(devs) == 8, devs
    # host-major: the first four block rows live on process 0
    assert [d.process_index for d in devs] == [0, 0, 0, 0, 1, 1, 1, 1]

    from nfclab.io.golden import GOLDEN_TYPES, read_golden_frames
    from nfclab.io.wav import read_wav
    from nfclab.runtime.decoder import NfcDecoder
    from nfclab.shard.multichip import sharded_capture_channels

    samples, info = read_wav(wav_path)
    chans = sharded_capture_channels(
        samples, info.sample_rate, devices=devs
    )
    frames = NfcDecoder().decode(
        samples, info.sample_rate, tpu_channels=chans
    )
    got = [f for f in frames if f.frame_type in GOLDEN_TYPES]
    want = read_golden_frames(golden_path)
    assert got == want, (
        f"proc {pid}: {len(got)} frames != golden {len(want)}"
    )
    print(f"DIST-GOLDEN-PASS proc={pid} frames={len(got)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
