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
