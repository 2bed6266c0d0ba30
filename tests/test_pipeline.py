"""Streaming pipeline tests: task wiring, subjects, replay device."""

import numpy as np

from nfclab.hw import DeviceFactory, RecordDevice, SignalBuffer, SignalType
from nfclab.io.golden import GOLDEN_TYPES, read_golden_frames
from nfclab.runtime.pipeline import run_radio_pipeline
from nfclab.runtime.subject import Subject


def test_subject_retained_replay():
    Subject.clear_registry()
    s = Subject.name("x.status")
    s.next({"a": 1}, retain=True)
    got = []
    s.subscribe(got.append)
    assert got == [{"a": 1}]
    s.next({"a": 2})
    assert got[-1] == {"a": 2}


def test_record_device(fixture_dir):
    dev = RecordDevice(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    dev.open("read")
    buf = dev.read(65536)
    assert buf.signal_type == SignalType.SIGNAL_TYPE_RADIO_SAMPLES
    assert buf.sample_rate == 10_000_000
    assert buf.elements == 65536
    total = buf.elements
    while not dev.is_eof():
        total += dev.read(65536).elements
    assert total == 114227


def test_device_factory():
    DeviceFactory.register_device(
        "record",
        lambda: ["record://dummy.wav"],
        lambda ident: RecordDevice(ident.split("://", 1)[1]),
    )
    assert "record://dummy.wav" in DeviceFactory.enumerate()
    assert DeviceFactory.enumerate("airspy") == []
    dev = DeviceFactory.new_instance("record://dummy.wav")
    assert isinstance(dev, RecordDevice)


def test_radio_pipeline_end_to_end(fixture_dir):
    wav = str(fixture_dir / "test_NFC-A_106kbps_001.wav")
    frames = run_radio_pipeline(wav)
    got = [f for f in frames if f.frame_type in GOLDEN_TYPES]
    want = read_golden_frames(str(fixture_dir / "test_NFC-A_106kbps_001.json"))
    assert got == want
