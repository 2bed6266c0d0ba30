"""Live logic-analyzer capture (the LogicDevice slot).

The reference captures ISO7816 logic over libusb from DSLogic/Sipeed
hardware (DSLogicDevice.cpp:247-412 stream mode).  CI has no USB, so the
native bridge ships a stream-mode *network* logic driver (logictcp) plus a
synthetic loopback — the exact strategy the radio side uses (rtl_tcp /
SpyServer clients).  These tests drive both: loopback smoke through the
pipeline task, and an end-to-end mock-server decode where a synthesized
ISO7816 session is served as packed probe bytes and must decode to the same
frames as the direct in-memory path.
"""

import queue
import socket
import struct
import threading

import numpy as np
import pytest

from test_iso7816 import SAMPLE_RATE, make_session


def _native():
    from nfclab.native.binding import native_available, sdr_drivers

    if not native_available():
        pytest.skip("native library unavailable")
    return sdr_drivers()


class MockLogicTcpServer:
    """Serves the logictcp wire format: 12-byte header ("LGC0" + u8
    channels + 3 reserved + u32 BE sample rate), then one packed byte per
    sample (bit i = probe i), then an orderly close."""

    def __init__(self, capture: np.ndarray, sample_rate: int):
        bits = (capture > 0.5).astype(np.uint8)
        packed = np.zeros(len(bits), np.uint8)
        for c in range(bits.shape[1]):
            packed |= bits[:, c] << c
        self.payload = packed.tobytes()
        self.channels = capture.shape[1]
        self.sample_rate = sample_rate
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        conn, _ = self.sock.accept()
        conn.settimeout(10.0)
        conn.sendall(
            b"LGC0"
            + bytes([self.channels, 0, 0, 0])
            + struct.pack(">I", self.sample_rate)
        )
        conn.sendall(self.payload)
        conn.shutdown(socket.SHUT_WR)
        try:
            conn.recv(1)  # wait for the client to finish
        except OSError:
            pass
        conn.close()
        self.sock.close()


def test_logicloop_pipeline_smoke():
    """The synthetic logic loopback streams [N, 4] blocks through
    logic.signal.raw (idle card interface: VCC/RST high, CLK toggling)."""
    drivers = _native()
    if "logicloop" not in drivers:
        pytest.skip("logicloop driver absent")
    from nfclab.runtime.pipeline import Executor, LiveLogicSourceTask
    from nfclab.runtime.subject import Subject

    blocks: "queue.Queue" = queue.Queue()
    Subject.name("logic.signal.raw").subscribe(blocks.put, replay=False)
    task = LiveLogicSourceTask("logicloop://test", duration_blocks=3)
    ex = Executor(pool_size=1)
    ex.submit(task)
    got = []
    try:
        while True:
            buf = blocks.get(timeout=5.0)
            if not buf.valid:
                break
            got.append(np.asarray(buf.data))
    finally:
        ex.shutdown()
    assert len(got) == 3
    for b in got:
        assert b.ndim == 2 and b.shape[1] == 4
        assert set(np.unique(b)) <= {0.0, 1.0}
        assert np.all(b[:, 3] == 1.0)  # VCC high
        assert 0.0 in b[:, 1] and 1.0 in b[:, 1]  # CLK toggles


def test_logictcp_e2e_decodes_iso7816():
    """Full chain: synthesized ISO7816 session -> packed bytes over TCP ->
    logictcp driver -> LiveLogicSourceTask -> streaming ISO decoder; frames
    equal the direct in-memory decode."""
    drivers = _native()
    if "logictcp" not in drivers:
        pytest.skip("logictcp driver absent")
    from nfclab.runtime.logic_decoder import IsoDecoder
    from nfclab.runtime.pipeline import (
        Executor,
        LiveLogicSourceTask,
        LogicDecoderTask,
    )
    from nfclab.runtime.subject import Subject

    capture = make_session(
        atr=(0x3B, 0x00), tpdu=(0x00, 0xB0, 0x00, 0x00, 0x02)
    )
    want = IsoDecoder().decode(capture, SAMPLE_RATE)
    assert want, "synthesized session must decode directly"

    server = MockLogicTcpServer(capture, SAMPLE_RATE)
    frames: "queue.Queue" = queue.Queue()
    Subject.name("logic.decoder.frame").subscribe(frames.put, replay=False)

    source = LiveLogicSourceTask(f"logictcp://127.0.0.1:{server.port}")
    decoder = LogicDecoderTask()
    ex = Executor(pool_size=2)
    ex.submit(decoder)
    ex.submit(source)
    got = []
    try:
        while True:
            frame = frames.get(timeout=15.0)
            if frame is None:  # per-session EOF sentinel
                break
            got.append(frame)
    finally:
        ex.shutdown()

    assert len(got) == len(want), (
        [repr(f) for f in got], [repr(f) for f in want]
    )
    for g, w in zip(got, want):
        assert g == w
