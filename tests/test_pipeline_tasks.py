"""Extended pipeline task tests: fourier, storage, trace writer, events."""

import threading

import numpy as np

from nfclab.hw import RecordDevice, SignalBuffer, SignalType
from nfclab.io.trz import read_trace
from nfclab.runtime.pipeline import (
    Executor,
    FourierTask,
    RadioSourceTask,
    ResamplingTask,
    SignalStorageTask,
    TraceStorageTask,
)
from nfclab.runtime.subject import Event, Subject


def test_event_envelope():
    got = []
    e = Event("Start", {"x": 1}, on_resolve=lambda: got.append("ok"),
              on_reject=lambda err: got.append(err))
    assert e.get("x") == 1
    e.resolve()
    e.reject("late")  # settled: ignored
    assert got == ["ok"]


def test_storage_and_trace_tasks(tmp_path, fixture_dir):
    Subject.clear_registry()
    wav = str(fixture_dir / "test_NFC-A_106kbps_001.wav")
    rec_path = str(tmp_path / "rec.wav")
    trz_path = str(tmp_path / "trace.trz")

    from nfclab.runtime.pipeline import RadioDecoderTask

    source = RadioSourceTask(RecordDevice(wav))
    decoder = RadioDecoderTask()
    resampler = ResamplingTask()
    recorder = SignalStorageTask(rec_path)
    tracer = TraceStorageTask(trz_path)

    done = threading.Event()
    Subject.name("radio.decoder.frame").subscribe(
        lambda f: done.set() if f is None else None, replay=False
    )

    ex = Executor()
    for t in (decoder, resampler, recorder, tracer):
        ex.submit(t)
    ex.submit(source)
    assert done.wait(120)
    ex.shutdown()

    # recorded WAV round-trips the raw stream
    dev = RecordDevice(rec_path)
    dev.open("read")
    total = 0
    while not dev.is_eof():
        total += dev.read(65536).elements
    assert total == 114227

    # the TRZ holds the decoded frames + adaptive streams
    frames, signals = read_trace(trz_path)
    assert len([f for f in frames if f.frame_type in (0x102, 0x103)]) == 10
    assert signals and all(s.kind == "radio" for s in signals)

    # replay the trace: TraceReplayTask republishes on storage.frame /
    # storage.signal (reference TraceStorageTask read path)
    from nfclab.runtime.pipeline import TraceReplayTask

    got_frames, got_signals = [], []
    replay_done = threading.Event()
    Subject.name("storage.frame").subscribe(
        lambda f: got_frames.append(f) if f is not None else None,
        replay=False,
    )
    Subject.name("storage.signal").subscribe(
        lambda b: got_signals.append(b) if b.valid else replay_done.set(),
        replay=False,
    )
    ex2 = Executor()
    ex2.submit(TraceReplayTask(trz_path))
    assert replay_done.wait(30)
    ex2.shutdown()
    assert got_frames == frames
    assert len(got_signals) == len(signals)
    total_points = sum(len(s.offsets) for s in signals)
    assert sum(len(b.data) for b in got_signals) == total_points


def test_decoder_command_control_plane(fixture_dir):
    """RadioDecoderTask's command surface (RadioDecoderTask.cpp:92-151):
    Query resolves the config snapshot, Configure merge-patches per-tech
    thresholds/enables with effect on the next session, Stop gates signal
    consumption, Start resumes."""
    import queue as _queue
    import time

    from nfclab.io.wav import read_wav
    from nfclab.runtime.pipeline import RadioDecoderTask

    Subject.clear_registry()
    samples, info = read_wav(
        str(fixture_dir / "test_NFC-A_106kbps_002.wav")
    )
    frames_q: "_queue.Queue" = _queue.Queue()
    Subject.name("radio.decoder.frame").subscribe(
        frames_q.put, replay=False
    )
    raw = Subject.name("radio.signal.raw")
    cmd = Subject.name("radio.decoder.command")

    decoder = RadioDecoderTask()
    ex = Executor(pool_size=1)
    ex.submit(decoder)

    def send(code, params=None, timeout=5.0):
        done = threading.Event()
        out = {}

        def ok(snap):
            out["snap"] = snap
            done.set()

        def bad(err):
            out["err"] = err
            done.set()

        cmd.next(Event(code, params, on_resolve=ok, on_reject=bad))
        assert done.wait(timeout), f"command {code} not handled"
        assert "err" not in out, out
        return out["snap"]

    def session(expect_polls: bool):
        raw.next(SignalBuffer(
            samples, info.sample_rate, 0,
            signal_type=SignalType.SIGNAL_TYPE_RADIO_SAMPLES,
        ))
        raw.next(SignalBuffer.eof(info.sample_rate))
        polls = 0
        while True:
            f = frames_q.get(timeout=30)
            if f is None:
                break
            polls += f.frame_type == 0x102
        assert (polls > 0) == expect_polls, polls

    try:
        # Query reflects the defaults
        snap = send("query")
        assert snap["protocol"]["nfca"]["correlationThreshold"] == 0.75
        assert snap["protocol"]["nfcb"]["enabled"] is True

        session(expect_polls=True)

        # Configure an impossible NfcA threshold -> next session decodes
        # no POLL frames (carrier events only)
        snap = send("configure", {"protocol": {
            "nfca": {"correlationThreshold": 5.0},
            "nfcb": {"enabled": False},
            "nfcf": {"enabled": False},
            "nfcv": {"enabled": False},
        }})
        assert snap["protocol"]["nfca"]["correlationThreshold"] == 5.0
        assert snap["protocol"]["nfcb"]["enabled"] is False
        session(expect_polls=False)

        # restore and verify the merge kept other defaults intact
        snap = send("configure", {"protocol": {
            "nfca": {"correlationThreshold": 0.75},
            "nfcb": {"enabled": True},
            "nfcf": {"enabled": True},
            "nfcv": {"enabled": True},
        }})
        assert snap["protocol"]["nfca"]["minimumModulationDeep"] == 0.90

        # Stop drops buffers entirely (no frames, no EOF session)
        send("stop")
        raw.next(SignalBuffer(
            samples, info.sample_rate, 0,
            signal_type=SignalType.SIGNAL_TYPE_RADIO_SAMPLES,
        ))
        time.sleep(0.5)
        assert frames_q.empty()

        # Start resumes
        send("start")
        session(expect_polls=True)

        # unknown command rejects
        done = threading.Event()
        err = []
        cmd.next(Event("bogus", on_resolve=lambda *a: done.set(),
                       on_reject=lambda e: (err.append(e), done.set())))
        assert done.wait(5) and err
    finally:
        ex.shutdown()


def test_reconcile_decoder_app_rx_loop():
    """app-rx parity (main.cpp:225-345): reconcile_decoder queries the
    running task, diffs the desired config, Configures only the changes,
    and converges (a second reconcile sends nothing)."""
    from nfclab.apps.decode_cli import reconcile_decoder
    from nfclab.runtime.config import detect_changes
    from nfclab.runtime.pipeline import RadioDecoderTask

    Subject.clear_registry()
    decoder = RadioDecoderTask()
    ex = Executor(pool_size=1)
    ex.submit(decoder)
    try:
        desired = {
            "powerLevelThreshold": 0.02,
            "protocol": {
                "nfcv": {"enabled": False},
                "nfca": {"correlationThreshold": 0.8},
            },
        }
        cmd = Subject.name("radio.decoder.command")
        snap = reconcile_decoder(cmd, desired)
        assert snap["powerLevelThreshold"] == 0.02
        assert snap["protocol"]["nfcv"]["enabled"] is False
        assert snap["protocol"]["nfca"]["correlationThreshold"] == 0.8
        # converged: nothing left to change
        assert detect_changes(snap, desired) is None
        snap2 = reconcile_decoder(cmd, desired)
        assert snap2 == snap

        # one-sided modulation-deep config: the Configure surface applies
        # min/max only as a pair; the reconciler must complete the pair
        # from the snapshot so the change lands and converges
        one_sided = {"protocol": {"nfcf": {"minimumModulationDeep": 0.22}}}
        snap3 = reconcile_decoder(cmd, one_sided)
        assert snap3["protocol"]["nfcf"]["minimumModulationDeep"] == 0.22
        assert snap3["protocol"]["nfcf"]["maximumModulationDeep"] == 0.90
        assert detect_changes(snap3, one_sided) is None
    finally:
        ex.shutdown()


def test_trace_storage_write_command(tmp_path, fixture_dir):
    """Write command (the reference GUI's save flow:
    Event{Write,{fileName,...}} on storage.command) dumps the accumulated
    trace on demand; the storage worker stays alive serving commands until
    Stop/terminate."""
    import time

    from nfclab.hw import RecordDevice
    from nfclab.runtime.pipeline import RadioDecoderTask, TraceStorageTask

    Subject.clear_registry()
    wav = str(fixture_dir / "test_NFC-A_106kbps_001.wav")
    final_path = str(tmp_path / "final.trz")
    snap_path = str(tmp_path / "snapshot.trz")

    from nfclab.runtime.pipeline import RadioSourceTask

    source = RadioSourceTask(RecordDevice(wav))
    decoder = RadioDecoderTask()
    resampler = ResamplingTask()
    storage = TraceStorageTask(final_path)
    ex = Executor(pool_size=4)
    ex.submit(storage)
    ex.submit(decoder)
    ex.submit(resampler)
    ex.submit(source)
    try:
        # wait until some frames accumulated, then snapshot via command
        deadline = time.time() + 30
        while time.time() < deadline and not storage.frames:
            time.sleep(0.05)
        assert storage.frames, "no frames accumulated"

        done = threading.Event()
        err = []
        Subject.name("storage.command").next(
            Event("configure", {"fileName": snap_path},
                  on_resolve=lambda snap: done.set(),
                  on_reject=lambda e: (err.append(e), done.set()))
        )
        assert done.wait(15) and not err, err
        frames, streams = read_trace(snap_path)
        assert frames  # the mid-capture snapshot carries decoded frames
    finally:
        ex.shutdown()
    # the normal end-of-stream write still happened
    frames2, _ = read_trace(final_path)
    assert len(frames2) >= len(frames)


def test_decoder_clear_command(fixture_dir):
    """Clear (RadioDecoderTask.cpp:368-375): drops pending signal buffers
    without ending the session — queued buffers never decode, and the task
    keeps serving later sessions normally."""
    import queue as _queue
    import time

    from nfclab.io.wav import read_wav
    from nfclab.runtime.pipeline import RadioDecoderTask

    Subject.clear_registry()
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_002.wav"))
    frames_q: "_queue.Queue" = _queue.Queue()
    Subject.name("radio.decoder.frame").subscribe(frames_q.put, replay=False)
    raw = Subject.name("radio.signal.raw")
    cmd = Subject.name("radio.decoder.command")

    decoder = RadioDecoderTask()
    # queue a whole session BEFORE the task loop starts, then a Clear: the
    # loop handles commands first, so the pending buffers (and their EOF)
    # are dropped before any decode
    raw.next(SignalBuffer(
        samples, info.sample_rate, 0,
        signal_type=SignalType.SIGNAL_TYPE_RADIO_SAMPLES,
    ))
    raw.next(SignalBuffer.eof(info.sample_rate))
    cleared = threading.Event()
    cmd.next(Event("clear", on_resolve=lambda *a: cleared.set(),
                   on_reject=lambda e: cleared.set()))
    ex = Executor(pool_size=1)
    ex.submit(decoder)
    try:
        assert cleared.wait(10)
        time.sleep(0.5)
        assert frames_q.empty(), "cleared buffers must not decode"

        # a fresh session decodes normally after Clear
        raw.next(SignalBuffer(
            samples, info.sample_rate, 0,
            signal_type=SignalType.SIGNAL_TYPE_RADIO_SAMPLES,
        ))
        raw.next(SignalBuffer.eof(info.sample_rate))
        polls = 0
        while True:
            f = frames_q.get(timeout=30)
            if f is None:
                break
            polls += f.frame_type == 0x102
        assert polls > 0
    finally:
        ex.shutdown()


def test_trace_storage_clear_command(tmp_path, fixture_dir):
    """TraceStorageTask Clear (TraceStorageTask.cpp:242-252): the
    accumulated frame cache empties, so a later write starts fresh."""
    from nfclab.core.frame import Frame

    Subject.clear_registry()
    task = TraceStorageTask(str(tmp_path / "t.trz"))
    Subject.name("radio.decoder.frame").next(
        Frame(tech_type=0x0101, frame_type=0x0102)
    )
    assert len(task.frames) == 1
    task._on_clear()
    assert task.frames == [] and task.signals == []


def test_live_mask_frontend_task(fixture_dir, monkeypatch):
    """RadioDecoderTask(frontend='mask'): live buffers flow through the
    one-stream TPU farm adapter (chained engine stubbed with the CPU mask
    oracle) and decode the same POLL frames as the host frontend."""
    import queue as _queue

    from conftest import ensure_cpu_devices

    ensure_cpu_devices()
    from test_mask_farm import _cpu_mask

    import nfclab.dsp.tpu_channels as tc
    from nfclab.io.wav import read_wav
    from nfclab.runtime.pipeline import RadioDecoderTask

    Subject.clear_registry()
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_002.wav"))
    samples = np.asarray(samples, np.float32)
    mask = _cpu_mask(samples, info.sample_rate)
    clock = {"t": 0}

    def fake_run(blocks, state, base0, pt, mp, cap_div=16, chunk=65536,
                 sample_rate=10_000_000, want_carry=False):
        lo = clock["t"]
        T = blocks.shape[1]
        seg = np.zeros(T, np.uint8)
        avail = mask[lo : lo + T]
        seg[: len(avail)] = avail
        np.testing.assert_array_equal(
            blocks[0][: len(avail)], samples[lo : lo + len(avail)]
        )
        rel = np.flatnonzero(seg).astype(np.int64)
        clock["t"] = lo + T
        if want_carry:
            carry = {"pen": np.zeros((1, 3), np.float32),
                     "end": np.zeros((1, 3), np.float32)}
            return [(rel, seg[rel])], state, carry
        return [(rel, seg[rel])], state

    monkeypatch.setattr(tc, "run_chained_masks", fake_run)
    monkeypatch.setattr(tc, "chain_state0", lambda *a, **k: object())

    frames_q: "_queue.Queue" = _queue.Queue()
    Subject.name("radio.decoder.frame").subscribe(frames_q.put, replay=False)
    raw = Subject.name("radio.signal.raw")
    decoder = RadioDecoderTask(frontend="mask")
    ex = Executor(pool_size=1)
    ex.submit(decoder)
    try:
        for off in range(0, len(samples), 65536):
            raw.next(SignalBuffer(
                samples[off : off + 65536], info.sample_rate, off,
                signal_type=SignalType.SIGNAL_TYPE_RADIO_SAMPLES,
            ))
        raw.next(SignalBuffer.eof(info.sample_rate))
        polls = 0
        while True:
            f = frames_q.get(timeout=60)
            if f is None:
                break
            polls += f.frame_type == 0x102
        assert polls > 0
        # chained dispatches actually ran (not the host fallback)
        assert clock["t"] > 0
    finally:
        ex.shutdown()


def test_live_mask_frontend_falls_back_to_host(fixture_dir, monkeypatch):
    """No accelerator at session start: frontend='mask' must keep decoding
    via the host frontend instead of failing the capture."""
    import queue as _queue

    import nfclab.runtime.pipeline as rp
    from nfclab.io.wav import read_wav

    Subject.clear_registry()
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_002.wav"))

    class Boom:
        def __init__(self, *a, **k):
            raise RuntimeError("no accelerator")

    monkeypatch.setattr(rp, "_MaskLiveDecoder", Boom)

    frames_q: "_queue.Queue" = _queue.Queue()
    Subject.name("radio.decoder.frame").subscribe(frames_q.put, replay=False)
    raw = Subject.name("radio.signal.raw")
    decoder = rp.RadioDecoderTask(frontend="mask")
    ex = Executor(pool_size=1)
    ex.submit(decoder)
    try:
        raw.next(SignalBuffer(
            np.asarray(samples, np.float32), info.sample_rate, 0,
            signal_type=SignalType.SIGNAL_TYPE_RADIO_SAMPLES,
        ))
        raw.next(SignalBuffer.eof(info.sample_rate))
        polls = 0
        while True:
            f = frames_q.get(timeout=60)
            if f is None:
                break
            polls += f.frame_type == 0x102
        assert polls > 0
    finally:
        ex.shutdown()


def test_live_mask_frontend_midsession_fallback(fixture_dir, monkeypatch):
    """A dispatch failure surfacing on the farm's IO thread MID-session
    (e.g. first kernel compile failing on an unsupported backend) must
    fall back to the host frontend losslessly: queued batches replay
    through the stream's host path and the session keeps decoding."""
    import queue as _queue

    from conftest import ensure_cpu_devices

    ensure_cpu_devices()
    import nfclab.dsp.tpu_channels as tc
    from nfclab.io.wav import read_wav
    from nfclab.runtime.pipeline import RadioDecoderTask

    Subject.clear_registry()
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_002.wav"))
    samples = np.asarray(samples, np.float32)

    def fake_run(*a, **k):
        raise RuntimeError("kernel bring-up failed")

    monkeypatch.setattr(tc, "run_chained_masks", fake_run)
    monkeypatch.setattr(tc, "chain_state0", lambda *a, **k: object())

    status_q: "_queue.Queue" = _queue.Queue()
    Subject.name("radio.decoder.status").subscribe(
        status_q.put, replay=False
    )
    frames_q: "_queue.Queue" = _queue.Queue()
    Subject.name("radio.decoder.frame").subscribe(frames_q.put, replay=False)
    raw = Subject.name("radio.signal.raw")
    decoder = RadioDecoderTask(frontend="mask")
    ex = Executor(pool_size=1)
    ex.submit(decoder)
    try:
        for off in range(0, len(samples), 65536):
            raw.next(SignalBuffer(
                samples[off : off + 65536], info.sample_rate, off,
                signal_type=SignalType.SIGNAL_TYPE_RADIO_SAMPLES,
            ))
        raw.next(SignalBuffer.eof(info.sample_rate))
        polls = 0
        while True:
            f = frames_q.get(timeout=60)
            if f is None:
                break
            polls += f.frame_type == 0x102
        assert polls > 0, "fallback session must still decode POLL frames"
        fallbacks = []
        while not status_q.empty():
            fallbacks.append(status_q.get_nowait())
        assert any("frontend_fallback" in s for s in fallbacks), fallbacks
    finally:
        ex.shutdown()
