"""On-TPU validation of the device logic frontend (dsp/logic_frontend).

Synthesizes an ISO7816-3 session (same builder as tests/test_iso7816.py),
runs the packed event-mask kernel on the TPU in uneven chunks with carried
state, and asserts:

- the four event index sets equal the host's dense scans exactly
  (edge math is one f32 subtract — bit-identical);
- a StreamingIsoDecoder fed by the device frontend produces the identical
  frame list as the one-shot host decode.

Exit code 0 = pass.  Run standalone (tests invoke it via subprocess because
the pytest session pins JAX to CPU).
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

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tests.test_iso7816 import SAMPLE_RATE, make_session

    from nfclab.demod.iso7816 import CH_CLK, CH_IO, CH_RST, CH_VCC
    from nfclab.dsp.logic_frontend import logic_event_mask
    from nfclab.runtime.logic_decoder import IsoDecoder, StreamingIsoDecoder

    capture = make_session(
        atr=(0x3B, 0x00), tpdu=[0x00, 0xA4, 0x04, 0x00, 0x02, 0xA4, 0x3F,
                                0x00, 0x90, 0x00]
    )

    # host-oracle index sets from the dense scans
    edge = np.zeros_like(capture)
    edge[1:] = capture[1:] - capture[:-1]
    want = {
        "io_edges": np.flatnonzero(edge[:, CH_IO] != 0),
        "io_falls": np.flatnonzero(edge[:, CH_IO] < 0),
        "line_edges": np.union1d(
            np.flatnonzero(edge[:, CH_RST] != 0),
            np.flatnonzero(edge[:, CH_VCC] != 0),
        ),
        "clk_falls": np.flatnonzero(edge[:, CH_CLK] < 0),
    }

    carry = None
    masks = []
    for off in range(0, len(capture), 50_001):
        m, carry = logic_event_mask(capture[off : off + 50_001], carry)
        masks.append(np.asarray(m))
    mask = np.concatenate(masks)

    from nfclab.dsp.logic_frontend import event_indices

    got = event_indices(mask)
    failures = []
    for name, w in want.items():
        if np.array_equal(got[name], w):
            print(f"{name}: exact ({len(w)} events)")
        else:
            failures.append(f"{name}: index sets differ")

    ref_frames = IsoDecoder().decode(capture, SAMPLE_RATE)
    dec = StreamingIsoDecoder(SAMPLE_RATE, channels=4, frontend="device")
    frames = []
    for off in range(0, len(capture), 50_001):
        frames.extend(dec.feed(capture[off : off + 50_001]))
    frames.extend(dec.finish())
    key = lambda f: (f.sample_start, f.sample_end, f.frame_type)
    if sorted(frames, key=key) == sorted(ref_frames, key=key) and ref_frames:
        print(f"frames: identical ({len(frames)})")
    else:
        failures.append("frames: device-fed decode differs from host")

    # logic farm: 3 concurrent streams, one batched mask dispatch per chunk
    from nfclab.runtime.farm import TpuLogicFarm

    sessions = [
        make_session(atr=(0x3B, 0x00),
                     tpdu=[0x00, 0xA4, 0x04, 0x00, 0x00, 0x90, 0x00]),
        make_session(atr=(0x3B, 0x00),
                     tpdu=[0x00, 0xB0, 0x00, 0x08, 0x00, 0x6A, 0x82]),
        capture,
    ]
    n = max(len(s) for s in sessions)
    blocks = np.ones((len(sessions), n, 4), np.float32)
    for i, s in enumerate(sessions):
        blocks[i, : len(s)] = s
        blocks[i, len(s):] = s[-1]
    want = [IsoDecoder().decode(blocks[i], SAMPLE_RATE)
            for i in range(len(sessions))]
    farm = TpuLogicFarm(len(sessions), SAMPLE_RATE)
    got = [[] for _ in sessions]
    for off in range(0, n, 70_000):
        for i, fr in enumerate(farm.feed(blocks[:, off : off + 70_000])):
            got[i].extend(fr)
    for i, fr in enumerate(farm.finish()):
        got[i].extend(fr)
    for i in range(len(sessions)):
        if sorted(got[i], key=key) == sorted(want[i], key=key) and want[i]:
            print(f"TPU LOGIC FARM stream {i}: OK ({len(want[i])} frames)")
        else:
            failures.append(f"logic farm stream {i}: frames differ")

    if failures:
        print("FAIL:")
        for f in failures:
            print(" -", f)
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
