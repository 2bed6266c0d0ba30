"""Native SDR bridge: loopback driver + rtl_tcp network client against a
mock rtl_tcp server (protocol: 12-byte RTL0 header, 5-byte BE commands,
unsigned 8-bit IQ stream)."""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from nfclab.hw.device import (
    PARAM_GAIN_MODE,
    PARAM_GAIN_VALUE,
    PARAM_SAMPLE_RATE,
    PARAM_TUNE_FREQUENCY,
    DeviceFactory,
)
from nfclab.hw.sdr import NativeSdrDevice


def _native_ok():
    from nfclab.native.binding import native_available

    return native_available()


pytestmark = pytest.mark.skipif(
    not _native_ok(), reason="native library unavailable"
)


class MockRtlTcpServer:
    """Minimal rtl_tcp server: header, command capture, deterministic IQ."""

    def __init__(self, n_bytes: int = 3 * 65536, payload=None,
                 min_commands: int = 4):
        self.commands = []
        self.min_commands = min_commands
        self.payload = (
            payload
            if payload is not None
            else (np.arange(n_bytes) % 256).astype(np.uint8)
        )
        self.n_bytes = len(self.payload)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        conn, _ = self.sock.accept()
        conn.settimeout(5.0)
        # header: magic + tuner type (R820T=5) + gain count
        conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
        # stream payload in chunks, polling for commands throughout (the
        # whole payload may fit in kernel buffers before the client even
        # issues its set-param commands)
        conn.setblocking(False)
        sent = 0
        pending = b""
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                pending += conn.recv(1024)
            except (BlockingIOError, InterruptedError):
                pass
            while len(pending) >= 5:
                op = pending[0]
                arg = struct.unpack(">I", pending[1:5])[0]
                self.commands.append((op, arg))
                pending = pending[5:]
            if sent < self.n_bytes:
                try:
                    sent += conn.send(
                        self.payload[sent : sent + 16384].tobytes()
                    )
                except (BlockingIOError, InterruptedError):
                    time.sleep(0.01)
            elif len(self.commands) >= self.min_commands:
                break
            else:
                time.sleep(0.01)
        # keep the socket open briefly so the client drains everything
        time.sleep(0.5)
        try:
            conn.close()
        except OSError:
            pass


def test_loopback_capture():
    dev = NativeSdrDevice("loopback://test")
    assert dev.open()
    assert dev.set(PARAM_SAMPLE_RATE, 10e6)
    assert dev.get(PARAM_SAMPLE_RATE) == 10e6
    assert dev.start()
    block = dev.read(timeout=2.0)
    assert block is not None and len(block) > 0
    assert dev.stop()
    dev.close()


def test_factory_enumerates_loopback():
    idents = DeviceFactory.enumerate("loopback")
    assert "loopback://test" in idents
    dev = DeviceFactory.new_instance("loopback://test")
    assert isinstance(dev, NativeSdrDevice)


def test_rtltcp_client_against_mock_server():
    server = MockRtlTcpServer()
    dev = NativeSdrDevice(f"rtltcp://127.0.0.1:{server.port}")
    assert dev.open()
    # driver info from the header
    assert dev.get(2001) == 5  # tuner type
    assert dev.get(2002) == 29  # gain count

    assert dev.set(PARAM_SAMPLE_RATE, 3_200_000)
    assert dev.set(PARAM_TUNE_FREQUENCY, 27_120_000)
    assert dev.set(PARAM_GAIN_MODE, 1)
    assert dev.set(PARAM_GAIN_VALUE, 49.6)

    assert dev.start()
    got = []
    deadline = time.time() + 8
    while sum(len(b) for b in got) < server.n_bytes and time.time() < deadline:
        block = dev.read(timeout=2.0)
        if block is not None:
            got.append(block)
    assert dev.stop()
    dev.close()
    # let the server finish draining the command stream before asserting
    server.thread.join(timeout=15)

    samples = np.concatenate(got)[: server.n_bytes]
    assert len(samples) == server.n_bytes
    # 8-bit -> float conversion: (x - 127.5) / 127.5
    expect = (server.payload.astype(np.float32) - 127.5) / 127.5
    np.testing.assert_array_equal(samples, expect)

    # the protocol commands arrived with BE-encoded arguments
    cmds = dict(server.commands)
    assert cmds[0x02] == 3_200_000
    assert cmds[0x01] == 27_120_000
    assert cmds[0x03] == 1
    assert cmds[0x04] == 496


class MockSpyServer:
    """Minimal Airspy SpyServer: HELLO handshake -> DEVICE_INFO +
    CLIENT_SYNC, then INT16 IQ messages once streaming is enabled.
    All little-endian, per the protocol (see sdr_bridge.cpp spyserver)."""

    MSG_DEVICE_INFO = 0
    MSG_CLIENT_SYNC = 1
    MSG_INT16_IQ = 101

    def __init__(self, payload_i16: np.ndarray, max_rate: int = 10_000_000,
                 chunk: int = 8192):
        self.payload = payload_i16.astype(np.int16)
        self.max_rate = max_rate
        self.chunk = chunk
        self.settings = []
        self.hello = None
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _msg(self, mtype: int, body: bytes) -> bytes:
        return struct.pack("<5I", 0x02000000 | 1700, mtype, 0, 0,
                           len(body)) + body

    def _serve(self):
        conn, _ = self.sock.accept()
        conn.settimeout(10.0)
        # CMD_HELLO: header + version + client name
        cmd, blen = struct.unpack("<2I", self._recv(conn, 8))
        body = self._recv(conn, blen)
        assert cmd == 0
        self.hello = (struct.unpack("<I", body[:4])[0], body[4:].decode())
        info = struct.pack(
            "<12I",
            1,            # DeviceType = AIRSPY_ONE
            0xA1B2C3D4,   # serial
            self.max_rate,
            self.max_rate,
            8,            # decimation stages
            1,            # gain stages
            21,           # max gain index
            24_000_000, 1_800_000_000,  # frequency range
            12,           # resolution bits
            0,            # minimum IQ decimation
            0,            # forced IQ format
        )
        conn.sendall(self._msg(self.MSG_DEVICE_INFO, info))
        sync = struct.pack("<9I", 1, 10, 27_120_000, 27_120_000, 0, 0, 0, 0, 0)
        conn.sendall(self._msg(self.MSG_CLIENT_SYNC, sync))

        # settings until STREAMING_ENABLED=1
        streaming = False
        deadline = time.time() + 20
        while not streaming and time.time() < deadline:
            cmd, blen = struct.unpack("<2I", self._recv(conn, 8))
            body = self._recv(conn, blen)
            if cmd == 2 and blen == 8:
                setting, value = struct.unpack("<2I", body)
                self.settings.append((setting, value))
                if setting == 1 and value == 1:
                    streaming = True
        # stream the payload as INT16 IQ messages
        raw = self.payload.tobytes()
        for off in range(0, len(raw), self.chunk * 2):
            conn.sendall(
                self._msg(self.MSG_INT16_IQ, raw[off : off + self.chunk * 2])
            )
        time.sleep(0.5)  # let the client drain before the close
        try:
            conn.close()
        except OSError:
            pass

    @staticmethod
    def _recv(conn, n):
        buf = b""
        while len(buf) < n:
            part = conn.recv(n - len(buf))
            if not part:
                raise ConnectionError("client closed")
            buf += part
        return buf


def test_spyserver_client_against_mock_server():
    rng = np.random.default_rng(7)
    payload = rng.integers(-32768, 32768, size=4 * 8192, dtype=np.int64)
    server = MockSpyServer(payload.astype(np.int16))

    dev = NativeSdrDevice(f"spyserver://127.0.0.1:{server.port}")
    assert dev.open()
    # device info parsed from the handshake
    assert dev.get(2001) == 1            # AIRSPY_ONE
    assert dev.get(2002) == 0xA1B2C3D4   # serial
    assert dev.get(2003) == 10_000_000   # max sample rate
    assert dev.get(2004) == 1            # can_control
    assert server.hello[0] == (2 << 24) | 1700
    assert server.hello[1] == "nfclab"

    # sample rate -> decimation stage: 2.5 MS/s = max >> 2
    assert dev.set(PARAM_SAMPLE_RATE, 2_500_000)
    assert dev.get(PARAM_SAMPLE_RATE) == 2_500_000
    assert dev.get(2005) == 2
    assert dev.set(PARAM_TUNE_FREQUENCY, 40_680_000)
    assert dev.set(PARAM_GAIN_VALUE, 12)

    assert dev.start()
    got = []
    n_expect = len(payload)
    deadline = time.time() + 8
    while sum(len(b) for b in got) < n_expect and time.time() < deadline:
        block = dev.read(timeout=2.0)
        if block is not None and len(block):
            got.append(block)
    assert dev.stop()
    dev.close()
    server.thread.join(timeout=15)

    samples = np.concatenate(got)[:n_expect]
    assert len(samples) == n_expect
    # INT16 -> float conversion: x / 32768
    expect = payload.astype(np.float32) / 32768.0
    np.testing.assert_array_equal(samples, expect)

    # settings arrived: decimation 2, frequency, gain, format INT16,
    # mode IQ_ONLY, streaming on
    st = dict(server.settings)
    assert st[102] == 2
    assert st[101] == 40_680_000
    assert st[2] == 12
    assert st[100] == 2   # STREAM_FORMAT_INT16
    assert st[0] == 1     # STREAM_MODE_IQ_ONLY
    assert st[1] == 1     # STREAMING_ENABLED


def test_spyserver_eof_on_server_close():
    """An orderly server shutdown surfaces as the zero-length EOF block
    (the in-band EOF convention, RadioDeviceTask.cpp:229-233)."""
    server = MockSpyServer(np.zeros(1024, np.int16))
    dev = NativeSdrDevice(f"spyserver://127.0.0.1:{server.port}")
    assert dev.open()
    assert dev.set(PARAM_SAMPLE_RATE, 10_000_000)
    assert dev.start()
    saw_eof = False
    deadline = time.time() + 10
    while time.time() < deadline:
        block = dev.read(timeout=2.0)
        if block is not None and len(block) == 0:
            saw_eof = True
            break
    assert saw_eof
    dev.stop()
    dev.close()


def test_live_pipeline_loopback():
    """Loopback capture flows through the live source task into the stream
    bus (carrier-only signal; decoder sees a steady field)."""
    from nfclab.runtime.pipeline import Executor, LiveRadioSourceTask
    from nfclab.runtime.subject import Subject

    got = []
    Subject.name("radio.signal.raw").subscribe(got.append, replay=False)
    task = LiveRadioSourceTask("loopback://test", duration_blocks=3)
    ex = Executor(pool_size=1)
    ex.submit(task)
    deadline = time.time() + 10
    while time.time() < deadline and sum(
        b.elements for b in got if b is not None and b.valid
    ) < 3 * 65536:
        time.sleep(0.05)
    ex.shutdown()
    blocks = [b for b in got if b is not None and b.valid]
    assert sum(b.elements for b in blocks) >= 3 * 65536
    assert blocks[0].sample_rate == 10_000_000
    # loopback emits a steady ~0.35 carrier envelope
    assert abs(float(np.mean(blocks[0].data)) - 0.35) < 0.01


def test_live_cli_decodes_rtltcp_stream(fixture_dir):
    """End-to-end: a reference capture served as 8-bit IQ over rtl_tcp is
    decoded live by the CLI (the RTL-SDR 8-bit quantization keeps 106 kbps
    decodable, matching the reference's own RTL-SDR guidance)."""
    import json as _json
    import os
    import subprocess
    import sys as _sys

    from nfclab.io.wav import read_wav

    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    # synthesize IQ with I = signal, Q = 0 -> magnitude == |signal|
    n = len(samples)
    iq = np.empty(2 * n, np.uint8)
    iq[0::2] = np.clip(np.round(samples * 127.5 + 127.5), 0, 255).astype(np.uint8)
    iq[1::2] = 128  # (128 - 127.5)/127.5 ~ 0

    server = MockRtlTcpServer(payload=iq, min_commands=2)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [
            _sys.executable, "-m", "nfclab.apps.decode_cli", "live",
            f"rtltcp://127.0.0.1:{server.port}", "--json",
            "--sample-rate", str(info.sample_rate), "--timeout", "3",
        ],
        capture_output=True, text=True, timeout=120, cwd=repo,
    )
    assert res.returncode == 0, res.stderr
    frames = [_json.loads(line) for line in res.stdout.splitlines() if line]
    polls = [f for f in frames if f.get("type") == "POLL"]
    assert polls, f"no POLL frames decoded: {frames[:5]}"
    # the capture opens with a WUPA (0x52)
    assert polls[0]["data"] == "52"
    assert polls[0]["tech"] == "NfcA"


class ReconnectRtlTcpServer:
    """rtl_tcp server accepting N sequential sessions on one port, each
    serving one payload then disconnecting (hotplug-cycle fixture)."""

    def __init__(self, payloads):
        self.payloads = payloads
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.sessions = 0
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        for payload in self.payloads:
            conn, _ = self.sock.accept()
            self.sessions += 1
            conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
            conn.sendall(payload.tobytes())
            time.sleep(0.4)  # let the client drain before the disconnect
            conn.close()
        self.sock.close()  # later open() attempts fail -> device absent


def test_live_radio_source_reconnects_after_disconnect():
    """Hotplug recovery (RadioDeviceTask.cpp:167-246): with reconnect=True
    the live source publishes an in-band EOF on disconnect, rescans, reopens
    the device, and keeps the sample offset monotonic across sessions."""
    import queue

    from nfclab.runtime.pipeline import LiveRadioSourceTask
    from nfclab.runtime.subject import Subject

    payload = (np.arange(2 * 65536) % 256).astype(np.uint8)
    server = ReconnectRtlTcpServer([payload, payload])

    events: "queue.Queue" = queue.Queue()
    unsub = Subject.name("radio.signal.raw").subscribe(
        events.put, replay=False
    )
    task = LiveRadioSourceTask(
        f"rtltcp://127.0.0.1:{server.port}",
        {PARAM_SAMPLE_RATE: 10e6},
        reconnect=True,
        rescan_interval=0.1,
    )
    th = threading.Thread(target=task.run, daemon=True)
    th.start()
    try:
        eofs = 0
        sessions_with_data = 0
        in_session = False
        offsets = []
        deadline = time.time() + 30
        while eofs < 2 and time.time() < deadline:
            try:
                buf = events.get(timeout=1.0)
            except queue.Empty:
                continue
            if not buf.valid:
                if in_session:
                    eofs += 1
                    in_session = False
                continue
            if not in_session:
                sessions_with_data += 1
                in_session = True
            offsets.append(buf.offset)
        assert server.sessions == 2
        assert sessions_with_data == 2, "no data after reconnect"
        assert eofs == 2, "missing in-band EOF per disconnect"
        assert offsets == sorted(offsets), "offset not monotonic"
        assert offsets[-1] > 0
    finally:
        unsub()
        task.terminate()
        th.join(timeout=10)
        assert not th.is_alive()


def test_reconnect_pipeline_decodes_after_disconnect(fixture_dir):
    """Full pipeline hotplug: source(reconnect=True) -> RadioDecoderTask.
    The decoder must treat the per-disconnect in-band EOF as a session
    boundary (flush + continue), so frames decode from BOTH sessions."""
    import queue

    from nfclab.io.wav import read_wav
    from nfclab.runtime.pipeline import (
        Executor,
        LiveRadioSourceTask,
        RadioDecoderTask,
    )
    from nfclab.runtime.subject import Subject

    Subject.clear_registry()
    samples, info = read_wav(
        str(fixture_dir / "test_NFC-A_106kbps_001.wav")
    )
    n = len(samples)
    iq = np.empty(2 * n, np.uint8)
    iq[0::2] = np.clip(
        np.round(samples * 127.5 + 127.5), 0, 255
    ).astype(np.uint8)
    iq[1::2] = 128
    server = ReconnectRtlTcpServer([iq, iq])

    frames: "queue.Queue" = queue.Queue()
    Subject.name("radio.decoder.frame").subscribe(frames.put, replay=False)

    source = LiveRadioSourceTask(
        f"rtltcp://127.0.0.1:{server.port}",
        {PARAM_SAMPLE_RATE: info.sample_rate},
        reconnect=True,
        rescan_interval=0.1,
    )
    decoder = RadioDecoderTask()
    ex = Executor(pool_size=2)
    ex.submit(decoder)
    ex.submit(source)
    try:
        sessions = []
        current = []
        deadline = time.time() + 60
        while len(sessions) < 2 and time.time() < deadline:
            try:
                f = frames.get(timeout=1.0)
            except queue.Empty:
                continue
            if f is None:
                sessions.append(current)
                current = []
            else:
                current.append(f)
        assert len(sessions) == 2, "decoder died after the first disconnect"
        for i, sess in enumerate(sessions):
            polls = [f for f in sess if f.frame_type == 0x102]
            assert polls, f"no POLL frames decoded in session {i}"
            assert polls[0].data == b"\x52"
    finally:
        ex.shutdown()


def test_live_task_decodes_spyserver_stream(fixture_dir):
    """End-to-end through the TASKS (not just the device client): a
    reference capture served as int16 IQ by the SpyServer mock is decoded
    by LiveRadioSourceTask -> RadioDecoderTask.  Regression test for the
    IQ->magnitude routing: the source must key on the driver's reported
    PARAM_SAMPLE_TYPE, not on an ident prefix (round-2 bug: every
    non-rtltcp radio driver published raw interleaved IQ as magnitude)."""
    import queue

    from nfclab.io.wav import read_wav
    from nfclab.runtime.pipeline import (
        Executor,
        LiveRadioSourceTask,
        RadioDecoderTask,
    )
    from nfclab.runtime.subject import Subject

    Subject.clear_registry()
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    n = len(samples)
    iq = np.zeros(2 * n, np.int16)
    iq[0::2] = np.clip(
        np.round(samples * 32767.0), -32768, 32767
    ).astype(np.int16)
    server = MockSpyServer(iq, max_rate=info.sample_rate)

    frames: "queue.Queue" = queue.Queue()
    Subject.name("radio.decoder.frame").subscribe(frames.put, replay=False)

    source = LiveRadioSourceTask(
        f"spyserver://127.0.0.1:{server.port}",
        {PARAM_SAMPLE_RATE: info.sample_rate},
    )
    decoder = RadioDecoderTask()
    ex = Executor(pool_size=2)
    ex.submit(decoder)
    ex.submit(source)
    try:
        got = []
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                f = frames.get(timeout=1.0)
            except queue.Empty:
                continue
            if f is None:
                break
            got.append(f)
        polls = [f for f in got if f.frame_type == 0x102]
        assert polls, f"no POLL frames decoded: {[repr(f) for f in got[:5]]}"
        assert polls[0].data == b"\x52"
    finally:
        ex.shutdown()


@pytest.fixture(scope="module")
def mock_rtlsdr(tmp_path_factory):
    import subprocess
    from pathlib import Path

    out_dir = tmp_path_factory.mktemp("mockrtl")
    out = out_dir / "librtlsdr.so.0"
    src = Path(__file__).parent / "mock_rtlsdr.cpp"
    subprocess.run(
        ["g++", "-O1", "-shared", "-fPIC", "-std=c++17", "-o", str(out),
         str(src)],
        check=True, capture_output=True,
    )
    return out


def test_mock_rtlsdr_usb_live_decode(fixture_dir, mock_rtlsdr, tmp_path):
    """The dlopen'd rtlsdr vendor driver path, hardware-free: a mock
    librtlsdr streams a reference capture as u8 IQ through the REAL driver
    (usb_drivers.cpp) + LiveRadioSourceTask + RadioDecoderTask in a
    subprocess whose LD_LIBRARY_PATH binds the mock.  Also asserts the
    software AGC stepped the tuner gain on live hardware (the round-2 bug
    left AGC dead for every vendor driver)."""
    import json as _json
    import os
    import subprocess
    import sys as _sys
    from pathlib import Path

    from nfclab.io.wav import read_wav

    repo = Path(__file__).resolve().parent.parent
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    n = len(samples)
    iq = np.empty(2 * n, np.uint8)
    iq[0::2] = np.clip(
        np.round(samples * 127.5 + 127.5), 0, 255
    ).astype(np.uint8)
    iq[1::2] = 128
    payload_file = tmp_path / "payload.bin"
    payload_file.write_bytes(iq.tobytes())
    log_file = tmp_path / "calls.log"

    env = dict(os.environ)
    env["PYTHONPATH"] = str(repo) + os.pathsep + env.get("PYTHONPATH", "")
    env["LD_LIBRARY_PATH"] = (
        str(mock_rtlsdr.parent) + os.pathsep + env.get("LD_LIBRARY_PATH", "")
    )
    env["NFCLAB_MOCK_RTL_PAYLOAD"] = str(payload_file)
    env["NFCLAB_MOCK_RTL_LOG"] = str(log_file)
    proc = subprocess.run(
        [_sys.executable, str(Path(__file__).parent / "usb_radio_child.py"),
         "rtlsdr://0", str(info.sample_rate)],
        capture_output=True, text=True, timeout=180, env=env, cwd=str(repo),
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    line = [l for l in proc.stdout.splitlines() if l.startswith("FRAMES:")]
    assert line, (proc.stdout, proc.stderr)
    frames = _json.loads(line[0][len("FRAMES:"):])
    polls = [f for f in frames if f["frame_type"] == 0x102]
    assert polls, f"no POLL frames decoded: {frames[:5]}"
    assert polls[0]["data"] == "52"

    calls = log_file.read_text().splitlines()
    assert any(c.startswith("sample_rate") for c in calls)
    # the software AGC stepped the tuner gain (capture level > 0.25)
    assert any(c.startswith("tuner_gain") for c in calls), calls


@pytest.fixture(scope="module")
def mock_mirisdr(tmp_path_factory):
    import subprocess
    from pathlib import Path

    out_dir = tmp_path_factory.mktemp("mockmiri")
    out = out_dir / "libmirisdr.so.0"
    src = Path(__file__).parent / "mock_mirisdr.cpp"
    subprocess.run(
        ["g++", "-O1", "-shared", "-fPIC", "-std=c++17", "-o", str(out),
         str(src)],
        check=True, capture_output=True,
    )
    return out


def test_mock_mirisdr_usb_live_decode(fixture_dir, mock_mirisdr, tmp_path):
    """MSi2500 bring-up parity (MiriDevice.cpp:149-165), hardware-free: a
    mock libmirisdr streams a reference capture as int16 384_S16 IQ through
    the REAL driver (usb_drivers.cpp miri_open_tr) + LiveRadioSourceTask +
    RadioDecoderTask.  Asserts the miri-specific bring-up sequence (hw
    flavour, 8 MHz bandwidth, 384_S16 sample format, BULK transfer, zero
    IF) reached the "hardware", the int16 conversion decodes golden POLL
    frames, and the AGC gain arrived in plain dB (not rtl tenths)."""
    import json as _json
    import os
    import subprocess
    import sys as _sys
    from pathlib import Path

    from nfclab.io.wav import read_wav

    repo = Path(__file__).resolve().parent.parent
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    n = len(samples)
    iq = np.zeros(2 * n, np.int16)
    iq[0::2] = np.clip(
        np.round(samples * 32767.0), -32768, 32767
    ).astype(np.int16)
    payload_file = tmp_path / "payload.bin"
    payload_file.write_bytes(iq.tobytes())
    log_file = tmp_path / "calls.log"

    env = dict(os.environ)
    env["PYTHONPATH"] = str(repo) + os.pathsep + env.get("PYTHONPATH", "")
    env["LD_LIBRARY_PATH"] = (
        str(mock_mirisdr.parent) + os.pathsep + env.get("LD_LIBRARY_PATH", "")
    )
    env["NFCLAB_MOCK_MIRI_PAYLOAD"] = str(payload_file)
    env["NFCLAB_MOCK_MIRI_LOG"] = str(log_file)
    proc = subprocess.run(
        [_sys.executable, str(Path(__file__).parent / "usb_radio_child.py"),
         "mirisdr://0", str(info.sample_rate)],
        capture_output=True, text=True, timeout=180, env=env, cwd=str(repo),
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    line = [l for l in proc.stdout.splitlines() if l.startswith("FRAMES:")]
    assert line, (proc.stdout, proc.stderr)
    frames = _json.loads(line[0][len("FRAMES:"):])
    polls = [f for f in frames if f["frame_type"] == 0x102]
    assert polls, f"no POLL frames decoded: {frames[:5]}"
    assert polls[0]["data"] == "52"

    calls = log_file.read_text().splitlines()
    # the miri bring-up sequence, in open order (MiriDevice.cpp:149-165)
    bringup = [c for c in calls if c.split()[0] in (
        "hw_flavour", "bandwidth", "sample_format", "transfer", "if_freq")]
    assert bringup == [
        "hw_flavour 0",
        "bandwidth 8000000",
        "sample_format 384_S16",
        "transfer BULK",
        "if_freq 0",
    ], calls
    assert any(c.startswith("sample_rate") for c in calls)
    # AGC stepped the tuner gain, in PLAIN dB: every rtl-family gain step
    # is a multiple of 10 in tenths; a miri value above 0 and not
    # rtl-scaled proves the dB path
    gains = [int(c.split()[1]) for c in calls if c.startswith("tuner_gain")]
    assert gains, calls
    assert all(g <= 100 for g in gains), gains


def test_usb_vendor_drivers_registered():
    """The dlopen vendor USB drivers (airspy/hydrasdr/rtlsdr/mirisdr) must
    be in the driver table; without the vendor libraries they enumerate
    empty and refuse open instead of crashing (the CI path)."""
    from nfclab.native.binding import native_available, sdr_drivers

    if not native_available():
        pytest.skip("native library unavailable")
    drivers = sdr_drivers()
    for name in ("airspy", "hydrasdr", "rtlsdr", "mirisdr"):
        assert name in drivers
    from nfclab.hw.sdr import NativeSdrDevice

    dev = NativeSdrDevice("mirisdr://0")
    # either the vendor lib is absent (open fails) or no hardware is
    # attached; both must fail cleanly
    assert dev.open() is False or dev.get(100) is not None


def test_usb_wrapper_probe():
    """hw::usb parity surface: availability probe + device list (empty or
    populated, but never crashing)."""
    import ctypes

    from nfclab.native.binding import _load, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    lib = _load()
    lib.nfclab_usb_available.restype = ctypes.c_int
    avail = lib.nfclab_usb_available()
    assert avail in (0, 1)
    if avail:
        buf = ctypes.create_string_buffer(65536)
        lib.nfclab_usb_device_list.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.nfclab_usb_device_list.restype = ctypes.c_int
        n = lib.nfclab_usb_device_list(buf, len(buf))
        assert n >= 0


def test_auto_discovery_attaches_and_rescans():
    """Hotplug discovery (RadioDeviceTask.cpp:194-246): ident "auto://<t>"
    attaches to whatever the device factory enumerates for the scanned
    schemes, stays "absent" while nothing is plugged, and re-scans after
    the device vanishes mid-stream."""
    import threading

    from nfclab.hw.device import DeviceFactory
    from nfclab.hw.sdr import NativeSdrDevice
    from nfclab.runtime.pipeline import LiveRadioSourceTask
    from nfclab.runtime.subject import Subject

    Subject.clear_registry()
    plugged = threading.Event()
    built = []

    def enumerate_fake():
        return ["fakesdr://0"] if plugged.is_set() else []

    def construct(ident):
        dev = NativeSdrDevice("loopback://test")
        built.append(dev)
        return dev

    DeviceFactory.register_device("fakesdr", enumerate_fake, construct)
    try:
        task = LiveRadioSourceTask(
            "auto://fakesdr", {PARAM_SAMPLE_RATE: 10_000_000},
            rescan_interval=0.05,
        )
        assert task.reconnect  # discovery implies rescan
        statuses = []
        Subject.name("radio.receiver.status").subscribe(
            lambda s: statuses.append(s.get("status")), replay=False
        )
        th = threading.Thread(target=task.run, daemon=True)
        th.start()

        # nothing plugged: the scanner reports absent and keeps polling
        deadline = time.time() + 5
        while "absent" not in statuses and time.time() < deadline:
            time.sleep(0.02)
        assert "absent" in statuses
        assert not built

        # plug the device: the task attaches and streams
        plugged.set()
        deadline = time.time() + 10
        while "streaming" not in statuses and time.time() < deadline:
            time.sleep(0.02)
        assert "streaming" in statuses
        assert len(built) == 1

        # unplug: loopback streams forever, so force the session to end the
        # way a vanished USB device does (driver EOF) and verify re-scan
        plugged.clear()
        built[0]._eof = True
        deadline = time.time() + 10
        while statuses.count("absent") < 2 and time.time() < deadline:
            time.sleep(0.02)
        assert statuses.count("absent") >= 2

        # re-plug: a SECOND device instance is constructed and streams
        plugged.set()
        deadline = time.time() + 10
        while statuses.count("streaming") < 2 and time.time() < deadline:
            time.sleep(0.02)
        assert statuses.count("streaming") >= 2
        assert len(built) == 2

        task.terminate()
        th.join(timeout=10)
        assert not th.is_alive()
    finally:
        DeviceFactory._registry.pop("fakesdr", None)


@pytest.mark.tpu
@pytest.mark.skipif(
    "NFCLAB_SKIP_TPU_TESTS" in __import__("os").environ
    and __import__("os").environ["NFCLAB_SKIP_TPU_TESTS"] == "1",
    reason="NFCLAB_SKIP_TPU_TESTS=1",
)
def test_live_mask_frontend_on_tpu(fixture_dir):
    """Full live loop on the real chip: mock rtl_tcp radio -> decode_cli
    live --frontend mask (one-stream TPU farm, pipelined chained
    dispatches, device-compacted triggers) -> correct POLL frames."""
    import json as _json
    import os
    import subprocess
    import sys as _sys

    from nfclab.io.wav import read_wav

    # probe for a real accelerator the same way the other tpu tests do
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    probe = subprocess.run(
        [_sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True, timeout=120, cwd=repo,
    )
    if probe.returncode != 0 or "cpu" in probe.stdout:
        pytest.skip("no TPU device")

    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    n = len(samples)
    iq = np.empty(2 * n, np.uint8)
    iq[0::2] = np.clip(np.round(samples * 127.5 + 127.5), 0, 255).astype(np.uint8)
    iq[1::2] = 128
    server = MockRtlTcpServer(payload=iq, min_commands=2)
    res = subprocess.run(
        [
            _sys.executable, "-m", "nfclab.apps.decode_cli", "live",
            f"rtltcp://127.0.0.1:{server.port}", "--json",
            "--frontend", "mask", "--no-settings",
            # idle timeout must outlive a COLD first kernel compile
            # (20-200 s on the remote-compile attachment)
            "--sample-rate", str(info.sample_rate), "--timeout", "240",
        ],
        capture_output=True, text=True, timeout=900, cwd=repo,
    )
    assert res.returncode == 0, res.stderr
    frames = [_json.loads(line) for line in res.stdout.splitlines() if line]
    polls = [f for f in frames if f.get("type") == "POLL"]
    assert polls and polls[0]["data"] == "52", frames[:5]
    assert polls[0]["tech"] == "NfcA"
