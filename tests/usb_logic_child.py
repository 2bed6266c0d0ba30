"""Subprocess body for tests/test_usb_logic.py.

Runs in a fresh interpreter whose NFCLAB_LIBUSB points at the mock libusb,
so the native bridge's lazily-bound USB surface (usb_api.h) binds the mock
device stack.  Drives the full live-capture chain — USB driver ->
LiveLogicSourceTask -> LogicDecoderTask — and prints the decoded frames as
one JSON line for the parent to compare against the direct in-memory
decode.

argv: <ident> <sample_rate>     e.g.  sipeed:// 24000000
"""

import ctypes
import json
import queue
import sys


def main() -> int:
    ident, rate = sys.argv[1], int(sys.argv[2])

    from nfclab.hw.device import PARAM_SAMPLE_RATE
    from nfclab.native.binding import _load
    from nfclab.runtime.pipeline import (
        Executor,
        LiveLogicSourceTask,
        LogicDecoderTask,
    )
    from nfclab.runtime.subject import Subject

    # the USB drivers must enumerate the mock devices
    lib = _load()
    buf = ctypes.create_string_buffer(4096)
    lib.nfclab_sdr_enumerate(buf, len(buf))
    listed = buf.value.decode()
    scheme = ident.split(":")[0]
    assert f"{scheme}://" in listed, f"{scheme} not enumerated: {listed!r}"

    frames_q: "queue.Queue" = queue.Queue()
    Subject.name("logic.decoder.frame").subscribe(frames_q.put, replay=False)

    source = LiveLogicSourceTask(ident, config={PARAM_SAMPLE_RATE: rate})
    decoder = LogicDecoderTask()
    ex = Executor(pool_size=2)
    ex.submit(decoder)
    ex.submit(source)
    got = []
    try:
        while True:
            frame = frames_q.get(timeout=30.0)
            if frame is None:  # per-session EOF sentinel
                break
            got.append(frame)
    finally:
        ex.shutdown()

    out = [
        {
            "tech_type": int(f.tech_type),
            "frame_type": int(f.frame_type),
            "frame_flags": int(f.frame_flags),
            "frame_phase": int(f.frame_phase),
            "frame_rate": int(f.frame_rate),
            "sample_start": int(f.sample_start),
            "sample_end": int(f.sample_end),
            "sample_rate": int(f.sample_rate),
            "data": f.data.hex(),
        }
        for f in got
    ]
    print("FRAMES:" + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
