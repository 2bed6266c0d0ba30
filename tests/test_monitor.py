"""Live monitor view: the one-page web app served from the stream bus must
show freshly decoded frames (StreamModel columns), the live spectrum, and
task status while a capture runs (the reference GUI's live-monitoring
capability, headless)."""

import json
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from nfclab.hw.device import PARAM_SAMPLE_RATE


def _native_ok():
    from nfclab.native.binding import native_available

    return native_available()


pytestmark = pytest.mark.skipif(
    not _native_ok(), reason="native library unavailable"
)


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.read()


def test_monitor_serves_live_frames_and_spectrum(fixture_dir):
    """End-to-end: mock rtl_tcp -> live source -> decoder + fourier ->
    MonitorServer; /data must contain freshly decoded POLL frames with the
    StreamModel columns, a spectrum, and task statuses; / serves the page."""
    from test_sdr_bridge import MockRtlTcpServer

    from nfclab.apps.monitor import MonitorServer
    from nfclab.io.wav import read_wav
    from nfclab.runtime.pipeline import (
        Executor,
        FourierTask,
        LiveRadioSourceTask,
        RadioDecoderTask,
        ResamplingTask,
    )
    from nfclab.runtime.subject import Subject

    Subject.clear_registry()
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    n = len(samples)
    iq = np.empty(2 * n, np.uint8)
    iq[0::2] = np.clip(
        np.round(samples * 127.5 + 127.5), 0, 255
    ).astype(np.uint8)
    iq[1::2] = 128
    server = MockRtlTcpServer(payload=iq, min_commands=1)

    # compile the FFT program outside the polling deadline (first compile
    # through the remote-attached chip can exceed it)
    from nfclab.dsp.spectrum import SpectrumProcessor

    SpectrumProcessor().process(
        np.zeros((1024, 2), np.float32), info.sample_rate
    )

    monitor = MonitorServer(port=0).start()
    source = LiveRadioSourceTask(
        f"rtltcp://127.0.0.1:{server.port}",
        {PARAM_SAMPLE_RATE: info.sample_rate},
    )
    decoder = RadioDecoderTask()
    fourier = FourierTask()
    ex = Executor(pool_size=4)
    ex.submit(decoder)
    ex.submit(fourier)
    ex.submit(ResamplingTask())
    ex.submit(source)
    try:
        base = f"http://127.0.0.1:{monitor.port}"
        page = _get(base + "/").decode()
        assert "nfclab live monitor" in page
        assert "/data" in page

        deadline = time.time() + 60
        snap = None
        while time.time() < deadline:
            snap = json.loads(_get(base + "/data"))
            polls = [f for f in snap["frames"] if f["event"] == "Poll"]
            if polls and snap["spectrum"]:
                break
            time.sleep(0.3)
        assert snap is not None
        polls = [f for f in snap["frames"] if f["event"] == "Poll"]
        assert polls, f"no POLL frames in monitor: {snap['frames'][:5]}"
        first = polls[0]
        # StreamModel columns (StreamModel.h:55-58)
        assert first["data"] == "52"
        assert first["tech"] == "NfcA"
        assert first["rate"] > 0
        assert {"id", "time", "delta", "flags"} <= set(first)
        # the inspect view: each decodable frame carries its ParserNfcA
        # detail tree (WUPA parses to a named node with the command field)
        assert first["detail"] is not None
        assert "WUPA" in first["detail"]["name"]
        assert first["detail"].get("flags") == ["REQUEST"]
        assert snap["spectrum"] and len(snap["spectrum"]) >= 64
        assert snap["wave"] and len(snap["wave"]) >= 16  # render stream
        t, v = snap["wave"][0]
        assert t >= 0.0 and isinstance(v, float)
        assert "radio.decoder" in snap["status"]
        assert "radio.receiver" in snap["status"]
    finally:
        ex.shutdown()
        monitor.stop()


def test_monitor_logic_wave_lanes():
    """Logic captures render as per-probe digital lanes: the live logicloop
    device through LogicDecoderTask + ResamplingTask must surface
    per-channel change-point streams in /data (the GUI logicView role)."""
    from nfclab.apps.monitor import MonitorServer
    from nfclab.runtime.pipeline import (
        Executor,
        LiveLogicSourceTask,
        LogicDecoderTask,
        ResamplingTask,
    )
    from nfclab.runtime.subject import Subject

    Subject.clear_registry()
    monitor = MonitorServer(port=0).start()
    source = LiveLogicSourceTask("logicloop://test", duration_blocks=4)
    ex = Executor(pool_size=3)
    ex.submit(LogicDecoderTask())
    ex.submit(ResamplingTask())
    ex.submit(source)
    try:
        base = f"http://127.0.0.1:{monitor.port}"
        deadline = time.time() + 30
        snap = None
        while time.time() < deadline:
            snap = json.loads(_get(base + "/data"))
            lanes = snap.get("logic_wave") or {}
            if lanes.get("0") and len(lanes["0"]) > 8:
                break
            time.sleep(0.3)
        lanes = snap.get("logic_wave") or {}
        # CLK (probe 1) is intentionally skipped by the resampler
        # (reference processLogicSignal parity — too dense to render);
        # IO/RST/VCC lanes must be present with digital values and
        # monotonic absolute times
        assert set(lanes) == {"0", "2", "3"}, lanes.keys()
        for ch, lane in lanes.items():
            assert len(lane) > 8, ch
            assert {v for _, v in lane} <= {0.0, 1.0}
            ts = [t for t, _ in lane]
            assert ts == sorted(ts)
    finally:
        ex.shutdown()
        monitor.stop()


def test_monitor_waterfall_rows():
    """FFT buffers accumulate u8-quantized waterfall rows (frequencyView
    role): bounded history, fixed bin count, newest last."""
    from nfclab.apps.monitor import MonitorState
    from nfclab.hw import SignalBuffer, SignalType
    from nfclab.runtime.subject import Subject

    Subject.clear_registry()
    state = MonitorState()
    try:
        fft = Subject.name("signal.fft")
        rng = np.random.default_rng(0)
        for i in range(200):   # beyond the history cap
            mag = rng.random(1024).astype(np.float32) * (0.01 + i * 0.01)
            fft.next(SignalBuffer(
                mag, 10_000_000, 0,
                signal_type=SignalType.SIGNAL_TYPE_FFT_BIN,
            ))
        snap = state.snapshot()
        wf = snap["waterfall"]
        assert len(wf) == 180          # deque cap
        assert all(len(r) == 128 for r in wf)
        assert all(0 <= v <= 255 for v in wf[-1])
        # louder rows quantize higher: last row's mean above first's
        assert (sum(wf[-1]) / 128) > (sum(wf[0]) / 128)
    finally:
        state.close()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return json.loads(r.read())
    except urllib.error.HTTPError as e:
        return json.loads(e.read())


def test_monitor_command_plane(fixture_dir, tmp_path):
    """The monitor is a CONTROL surface, not just a viewer (QtControl.cpp:
    340-420 DecoderControlEvent role): POST /command drives the task
    command plane.  Asserted end-to-end: a threshold Configure changes
    what the decoder decodes, Stop/Start gates the session, and a storage
    Configure writes a TRZ trace file with the decoded frames."""
    from nfclab.apps.monitor import MonitorServer
    from nfclab.io.trz import read_trace
    from nfclab.io.wav import read_wav
    from nfclab.runtime.pipeline import (
        Executor,
        RadioDecoderTask,
        ResamplingTask,
        TraceStorageTask,
    )
    from nfclab.runtime.subject import Subject
    from nfclab.hw.signal import SignalBuffer, SignalType

    Subject.clear_registry()
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))

    monitor = MonitorServer(port=0).start()
    decoder = RadioDecoderTask()
    storage = TraceStorageTask(str(tmp_path / "unused.trz"))
    frames_q = []
    Subject.name("radio.decoder.frame").subscribe(
        frames_q.append, replay=False
    )
    raw = Subject.name("radio.signal.raw")
    ex = Executor(pool_size=3)
    ex.submit(decoder)
    ex.submit(ResamplingTask())
    ex.submit(storage)
    base = f"http://127.0.0.1:{monitor.port}"

    def feed_session():
        for off in range(0, len(samples), 65536):
            raw.next(SignalBuffer(
                samples[off : off + 65536], info.sample_rate, off,
                signal_type=SignalType.SIGNAL_TYPE_RADIO_SAMPLES,
            ))
        raw.next(SignalBuffer.eof(info.sample_rate))

    def wait_session_end(n_before, timeout=30.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if frames_q.count(None) > n_before:
                return
            time.sleep(0.05)
        raise TimeoutError("decode session did not finish")

    try:
        # 1. baseline session decodes POLL frames
        feed_session()
        wait_session_end(0)
        polls = [
            f for f in frames_q
            if f is not None and f.frame_type == 0x102
        ]
        assert polls and polls[0].data == b"\x52"

        # 2. Configure via the web command plane: an impossible NFC-A
        # correlation threshold applies from the next session on, and the
        # Query snapshot reflects it
        d = _post(base + "/command", {
            "subject": "radio.decoder", "code": "configure",
            "params": {"protocol": {"nfca": {
                "correlationThreshold": 99.0}}},
        })
        assert d["ok"], d
        d = _post(base + "/command", {
            "subject": "radio.decoder", "code": "query",
        })
        assert d["ok"], d
        got = d["result"]["protocol"]["nfca"]["correlationThreshold"]
        assert got == 99.0
        frames_q.clear()
        feed_session()
        wait_session_end(0)
        assert not [
            f for f in frames_q
            if f is not None and f.frame_type in (0x102, 0x103)
        ], "impossible threshold still decoded frames"

        # 3. Stop gates buffer consumption entirely; Start resumes
        d = _post(base + "/command", {
            "subject": "radio.decoder", "code": "stop"})
        assert d["ok"], d
        frames_q.clear()
        feed_session()
        time.sleep(0.5)
        assert not [f for f in frames_q if f is not None]
        d = _post(base + "/command", {
            "subject": "radio.decoder", "code": "start"})
        assert d["ok"], d
        # restore a decodable threshold for the storage leg
        d = _post(base + "/command", {
            "subject": "radio.decoder", "code": "configure",
            "params": {"protocol": {"nfca": {
                "correlationThreshold": 0.5}}},
        })
        assert d["ok"], d
        frames_q.clear()
        feed_session()
        wait_session_end(0)
        polls = [
            f for f in frames_q
            if f is not None and f.frame_type == 0x102
        ]
        assert polls, "decoder did not resume after Start"

        # 4. trace save through the web UI's storage command
        out = tmp_path / "via_monitor.trz"
        d = _post(base + "/command", {
            "subject": "storage", "code": "configure",
            "params": {"fileName": str(out)},
        })
        assert d["ok"], d
        assert out.exists()
        saved, _streams = read_trace(str(out))
        assert [f for f in saved if f.frame_type == 0x102]

        # 5. uncommandable subjects and bad codes are rejected cleanly
        d = _post(base + "/command", {
            "subject": "radio.decoder.frame", "code": "stop"})
        assert not d["ok"]
        d = _post(base + "/command", {
            "subject": "radio.decoder", "code": "reboot"})
        assert not d["ok"]
    finally:
        ex.shutdown()
        monitor.stop()


def test_monitor_signal_analysis_surface():
    """Interactive signal analysis (the GUI's graph/ time cursors + zoom +
    hex view role): the page ships the interactions and the frame snapshot
    carries the [start, end] span the wave highlight needs."""
    from nfclab.apps.monitor import MonitorState, _PAGE
    from nfclab.core.frame import Frame
    from nfclab.core.frame import FramePhase, FrameTech, FrameType

    # client-side features are pinned by presence (no JS engine in CI)
    for token in ("hexDump", "addEventListener('wheel'", "dblclick",
                  "cursors", "waveView", "selSpan", "wreadout"):
        assert token in _PAGE, token

    state = MonitorState()
    f = Frame(
        tech_type=int(FrameTech.NfcATech),
        frame_type=int(FrameType.NfcPollFrame),
        frame_phase=int(FramePhase.NfcSelectionPhase),
        sample_start=1000,
        sample_end=2000,
        sample_rate=10_000_000,
    )
    f.time_start = 1e-4
    f.time_end = 2e-4
    f.data = bytes([0x52])
    state._on_frame(f)
    snap = state.snapshot()
    assert snap["frames"][0]["time_end"] == 2e-4
    assert snap["frames"][0]["data"] == "52"


def test_monitor_open_trace(tmp_path):
    """The monitor can OPEN a saved TRZ (QtControl open-file role): POST
    /open routes the file through TraceReplayTask and the replayed frames
    + adaptive streams land in the monitor's frame table and wave lanes."""
    import numpy as np

    from nfclab.apps.monitor import MonitorServer
    from nfclab.core.frame import Frame
    from nfclab.io.trz import SignalStream, write_trace
    from nfclab.runtime.subject import Subject

    Subject.clear_registry()
    frames = [
        Frame(tech_type=0x0101, frame_type=0x0102, frame_rate=105938,
              sample_rate=10_000_000, sample_start=1000, sample_end=2000,
              time_start=1e-4, time_end=2e-4, data=bytes([0x52])),
        Frame(tech_type=0x0101, frame_type=0x0103, frame_rate=105938,
              sample_rate=10_000_000, sample_start=3000, sample_end=4000,
              time_start=3e-4, time_end=4e-4, data=bytes([0x04, 0x00])),
    ]
    sig = SignalStream(
        stream_id=0, sample_rate=10_000_000, kind="radio",
        offsets=np.arange(0, 4096, 16, dtype=np.int64),
        values=np.linspace(0, 1, 256).astype(np.float32),
    )
    trz = tmp_path / "session.trz"
    write_trace(str(trz), frames, [sig])

    monitor = MonitorServer(port=0).start()
    base = f"http://127.0.0.1:{monitor.port}"
    try:
        # a bogus path rejects
        r = _post(f"{base}/open", {"path": str(tmp_path / "missing.trz")})
        assert not r["ok"] and "no such trace" in r["error"]

        r = _post(f"{base}/open", {"path": str(trz)})
        assert r["ok"], r
        deadline = time.time() + 20
        rows = []
        while time.time() < deadline:
            with urllib.request.urlopen(f"{base}/data", timeout=10) as resp:
                snap = json.loads(resp.read())
            rows = snap["frames"]
            if len(rows) >= 2 and snap.get("wave"):
                break
            time.sleep(0.1)
        assert len(rows) == 2, rows
        assert rows[0]["data"] == "52" and rows[0]["tech"] == "NfcA"
        assert rows[1]["event"] in ("LISTEN", "?") or rows[1]["data"]
        assert snap["wave"], "replayed adaptive stream must reach the view"
    finally:
        monitor.stop()
