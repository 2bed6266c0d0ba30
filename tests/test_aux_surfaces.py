"""Direct tests for auxiliary surfaces otherwise exercised only
indirectly: throughput meters, logging, debug WAV taps, the bench CLI's
decode path, and the streaming bench harness."""

import io

import numpy as np
import pytest


def _native_ok():
    from nfclab.native.binding import native_available

    return native_available()


pytestmark = pytest.mark.skipif(
    not _native_ok(), reason="native library unavailable"
)


def test_throughput_meter_sliding_window():
    from nfclab.runtime.metrics import Throughput

    t = Throughput()
    assert t.average() == 0.0
    for i in range(10):
        t.update(1000, now=float(i))
    # 9 intervals x 1000 over 9 s (first event's elements excluded)
    assert t.average() == pytest.approx(1000.0)
    assert t.total == 10_000


def test_logger_levels_and_stream():
    import time

    from nfclab.runtime import logging as nlog

    buf = io.StringIO()
    nlog.init(stream=buf, levels={"noisy": "WARN"}, root_level=nlog.INFO)
    log = nlog.Logger.get_logger("test.module")
    log.info("hello {}", "world")
    quiet = nlog.Logger.get_logger("noisy")
    quiet.info("dropped")
    quiet.warn("kept")
    deadline = time.time() + 5
    while "kept" not in buf.getvalue() and time.time() < deadline:
        time.sleep(0.02)   # async appender thread drains the queue
    out = buf.getvalue()
    assert "hello world" in out
    assert "[test.module]" in out
    assert "dropped" not in out
    assert "kept" in out


def test_debug_taps_roundtrip(tmp_path):
    """The 10-channel debug WAV taps (NfcTech.h:47-126 role) write
    readable files with the conditioning/SD channels laid out in order."""
    from nfclab.core.params import SignalParams
    from nfclab.dsp.debugtap import write_logic_debug, write_radio_debug
    from nfclab.io.wav import read_wav
    from nfclab.native.binding import condition_exact

    rng = np.random.default_rng(0)
    sig = (0.4 + 0.05 * rng.random(20_000)).astype(np.float32)
    cond = condition_exact(sig, SignalParams(10_000_000))
    sd = [rng.random(20_000).astype(np.float32) for _ in range(2)]
    p = write_radio_debug(cond, sd, 10_000_000,
                          str(tmp_path / "radio-debug.wav"))
    data, info = read_wav(p)
    assert info.channels == 10
    assert np.allclose(data[:, 0], sig, atol=2e-4)

    logic = rng.integers(0, 2, (5_000, 4)).astype(np.float32)
    p2 = write_logic_debug(logic, 10_000_000,
                           str(tmp_path / "logic-debug.wav"))
    d2, i2 = read_wav(p2)
    assert i2.channels == 10
    assert np.allclose(d2[:, :4], logic, atol=2e-4)


def test_bench_decode_smoke(fixture_dir):
    from nfclab.apps.bench_cli import bench_decode

    r = bench_decode([str(fixture_dir / "test_NFC-A_106kbps_001.wav")])
    assert r["metric"] == "end_to_end_decode_samples_per_second"
    assert r["value"] > 0
    assert r["frames"] > 0
    assert r["captures"] == 1


def test_streaming_bench_smoke():
    from nfclab.tools.streaming_bench import bench_single_stream

    r = bench_single_stream(total=400_000, chunk=65536, window=1 << 17)
    assert r["value"] > 0
    assert r["frames"] > 0
    assert r["samples"] == 400_000
