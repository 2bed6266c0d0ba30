"""Tests for storage (TRZ), spectrum, and adaptive resampling processors."""

import numpy as np

from nfclab.core.frame import Frame, FrameTech, FrameType
from nfclab.dsp.resample import (
    RADIO_INTERVAL,
    THRESHOLD,
    WINDOW,
    resample_logic,
    resample_radio,
)
from nfclab.io.trz import SignalStream, read_trace, write_trace


def _resample_radio_oracle(x):
    """Direct transcription of SignalResamplingTask.cpp:168-225."""
    x = x.astype(np.float32)
    n = len(x)
    avrg = np.float32(0)
    last = x[0]
    out_v, out_o = [float(x[0])], [0.0]
    for i in range(WINDOW // 2):
        avrg += x[i]
    c, p = 0, -1
    r, a = -(WINDOW // 2) - 1, WINDOW // 2
    i = 0
    while i < n:
        value = x[i]
        if a < n:
            avrg += x[a]
        if r >= 0:
            avrg -= x[r]
        stdev = abs(value - (avrg / np.float32(WINDOW)))
        if stdev > np.float32(THRESHOLD) or (i - c) >= RADIO_INTERVAL:
            if stdev > np.float32(THRESHOLD) and c < p:
                out_v.append(float(last))
                out_o.append(float(p))
            out_v.append(float(value))
            out_o.append(float(i))
            c = i
        last = value
        i += 1
        p += 1
        a += 1
        r += 1
    if c < p:
        out_v.append(float(last))
        out_o.append(float(p))
    return np.asarray(out_v, np.float32), np.asarray(out_o, np.float32)


def test_resample_radio_matches_oracle():
    rng = np.random.default_rng(3)
    x = 0.3 + 0.001 * rng.standard_normal(5000)
    # inject some pulses
    x[1000:1040] = 0.05
    x[3000:3010] = 0.6
    x = x.astype(np.float32)
    v1, o1 = resample_radio(x)
    v2, o2 = _resample_radio_oracle(x)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(v1, v2)
    # compression actually happened
    assert len(v1) < len(x) / 4


def test_resample_logic():
    x = np.zeros((1000, 4), np.float32)
    x[100:200, 0] = 1.0
    x[:, 1] = np.arange(1000) % 2  # CLK toggles (skipped)
    out = resample_logic(x)
    assert 1 not in out  # CLK skipped
    vals, offs = out[0]
    assert offs[0] == 0.0
    assert 100.0 in offs and 200.0 in offs
    # idle channel gets forced points every 255 samples
    vals3, offs3 = out[3]
    assert list(offs3) == [0.0, 255.0, 510.0, 765.0]


def test_trz_roundtrip(tmp_path):
    frames = [
        Frame(
            tech_type=int(FrameTech.NfcATech),
            frame_type=int(FrameType.NfcPollFrame),
            frame_phase=0x102,
            frame_rate=105938,
            data=b"\x26",
            sample_start=1000,
            sample_end=2000,
            sample_rate=10_000_000,
            time_start=1e-4,
            time_end=2e-4,
            date_time=1e-4,
        )
    ]
    rng = np.random.default_rng(0)
    offs = np.cumsum(rng.integers(1, 200, 50)).astype(np.int64)
    vals = rng.random(50).astype(np.float32) - 0.5
    radio = SignalStream(0, 10_000_000, "radio", offs, vals, 0)
    logic = SignalStream(2, 24_000_000, "logic", offs, (vals > 0).astype(np.float32), 0)

    p = tmp_path / "t.trz"
    write_trace(str(p), frames, [radio, logic])
    rframes, rsignals = read_trace(str(p))
    assert rframes == frames
    assert len(rsignals) == 2
    for s in rsignals:
        if s.kind == "radio":
            np.testing.assert_array_equal(s.offsets, offs)
            # values round-trip through int16 scaling
            np.testing.assert_allclose(s.values, vals, atol=1 / (1 << 15))
        else:
            np.testing.assert_array_equal(s.offsets, offs)
            np.testing.assert_array_equal(s.values, (vals > 0).astype(np.float32))


def test_spectrum():
    from tests.conftest import ensure_cpu_devices

    ensure_cpu_devices()
    from nfclab.dsp.spectrum import SpectrumProcessor

    rate = 10_000_000
    n = 4096
    t = np.arange(n) / rate
    tone = 1.2e6
    iq = np.stack(
        [np.cos(2 * np.pi * tone * t), np.sin(2 * np.pi * tone * t)], axis=-1
    ).astype(np.float32)
    sp = SpectrumProcessor(length=1024, bandwidth=10e6)
    mag = sp.process(iq, rate)
    assert mag.shape == (1024,)
    # peak at +1.2 MHz: bin = 512 + tone/rate*1024
    peak = np.argmax(mag)
    expect = 512 + int(round(tone / rate * 1024))
    assert abs(int(peak) - expect) <= 1
