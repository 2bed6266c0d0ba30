"""Batch decode API: conditioning once, parallel host walks."""

from nfclab.io.golden import GOLDEN_TYPES, read_golden_frames
from nfclab.runtime.batch import decode_batch


def test_decode_batch_matches_goldens(fixture_dir):
    names = ["test_NFC-A_106kbps_001", "test_NFC-A_106kbps_002"]
    paths = [str(fixture_dir / f"{n}.wav") for n in names]
    res = decode_batch(paths, workers=2, conditioner="native")
    for name, path in zip(names, paths):
        got = [f for f in res[path] if f.frame_type in GOLDEN_TYPES]
        want = read_golden_frames(str(fixture_dir / f"{name}.json"))
        assert got == want


def test_decode_batch_thread_pool_matches_goldens(fixture_dir):
    """The thread-pool fan-out (GIL-free native walks, the aggregate
    throughput configuration on few-core hosts) decodes byte-identically
    to the serial/process paths — exercises native-layer thread safety on
    a multi-tech capture plus per-tech fixtures concurrently."""
    names = [
        "test_NFC-A_106kbps_001",
        "test_POLL_AB_001",
        "test_NFC-V_26kbps_001",
        "test_NFC-F_212kbps_001",
    ]
    paths = [str(fixture_dir / f"{n}.wav") for n in names]
    res = decode_batch(paths, workers=4, conditioner="native", pool="thread")
    for name, path in zip(names, paths):
        got = [f for f in res[path] if f.frame_type in GOLDEN_TYPES]
        want = read_golden_frames(str(fixture_dir / f"{name}.json"))
        assert got == want


def test_device_put_samples_i16_grid_bit_exact(fixture_dir):
    """i16-grid uploads dequantize on device bit-identically to the host
    f32 samples (both directions only scale by powers of two), and
    off-grid samples fall back to the f32 upload."""
    from conftest import ensure_cpu_devices

    ensure_cpu_devices()
    import numpy as np

    from nfclab.dsp.tpu_channels import device_put_samples
    from nfclab.io.wav import read_wav

    samples, _ = read_wav(str(fixture_dir / "test_NFC-A_106kbps_002.wav"))
    x = np.asarray(samples, np.float32)[None, :1024]
    d = device_put_samples(x)
    assert np.array_equal(np.asarray(d), x)
    assert np.asarray(d).dtype == np.float32

    off = x + np.float32(1e-6)  # off the i16 grid
    d2 = device_put_samples(off)
    assert np.array_equal(np.asarray(d2), off)


def test_device_put_samples_i8_grid_bit_exact():
    """8-bit-grid samples (RTL-SDR capture depth) ship as 1-byte codes and
    dequantize on device bit-identically."""
    from conftest import ensure_cpu_devices

    ensure_cpu_devices()
    import numpy as np

    from nfclab.dsp.tpu_channels import device_put_samples

    codes = np.arange(-128, 128, dtype=np.int16)
    x = (codes.astype(np.float32) / np.float32(1 << 7))[None, :]
    d = device_put_samples(x)
    assert np.array_equal(np.asarray(d), x)
    assert np.asarray(d).dtype == np.float32
