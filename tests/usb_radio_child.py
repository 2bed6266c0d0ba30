"""Subprocess body for the USB vendor radio live-decode test.

Runs in a fresh interpreter whose LD_LIBRARY_PATH points at the mock
librtlsdr (tests/mock_rtlsdr.cpp), so usb_drivers.cpp's dlopen binds the
mock "hardware".  Drives the full live radio chain — vendor USB driver ->
LiveRadioSourceTask (IQ->magnitude + software AGC) -> RadioDecoderTask —
and prints the decoded frames as one JSON line.

argv: <ident> <sample_rate>     e.g.  rtlsdr://0 10000000
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
        LiveRadioSourceTask,
        RadioDecoderTask,
    )
    from nfclab.runtime.subject import Subject

    lib = _load()
    buf = ctypes.create_string_buffer(4096)
    lib.nfclab_sdr_enumerate(buf, len(buf))
    listed = buf.value.decode()
    scheme = ident.split(":")[0]
    assert f"{scheme}://" in listed, f"{scheme} not enumerated: {listed!r}"

    frames_q: "queue.Queue" = queue.Queue()
    Subject.name("radio.decoder.frame").subscribe(frames_q.put, replay=False)

    source = LiveRadioSourceTask(ident, config={PARAM_SAMPLE_RATE: rate})
    decoder = RadioDecoderTask()
    ex = Executor(pool_size=2)
    ex.submit(decoder)
    ex.submit(source)
    got = []
    try:
        while True:
            frame = frames_q.get(timeout=60.0)
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
            "frame_rate": int(f.frame_rate),
            "sample_rate": int(f.sample_rate),
            "data": f.data.hex(),
        }
        for f in got
    ]
    print("FRAMES:" + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
