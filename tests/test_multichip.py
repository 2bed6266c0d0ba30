"""Multi-device decode correctness on the virtual 8-device CPU mesh.

The reference's whole value is frames out (test-sdr/main.cpp:200-319), so the
multi-chip story is certified at the frame level: a real capture sharded over
the mesh (blocks data-parallel, halos over ppermute) must decode to the exact
golden frame list — same RawFrame.cpp:82-97 equality as the single-device
suite — and the ppermute-carried halo must be bit-identical to the
locally-materialized one.
"""

import numpy as np
import pytest

from conftest import ensure_cpu_devices


def _devices(n):
    ensure_cpu_devices()
    import jax

    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} virtual CPU devices")
    return devs[:n]


FIXTURES = [
    "test_POLL_ABF_001",
    "test_NFC-A_424kbps_002",
    "test_NFC-V_26kbps_001",
    # long frames crossing block boundaries mid-modulation (the frozen-
    # envelope hazard class caught on the batch device-cond path)
    "test_NFC-B_106kbps_002",
]


@pytest.mark.parametrize("name", FIXTURES)
def test_sharded_decode_matches_golden(fixture_dir, name):
    """Sharded (8-device) decode == golden frames for a real capture."""
    devs = _devices(8)
    from nfclab.io.golden import GOLDEN_TYPES, read_golden_frames
    from nfclab.io.wav import read_wav
    from nfclab.shard.multichip import decode_sharded

    samples, info = read_wav(str(fixture_dir / f"{name}.wav"))
    frames = decode_sharded(samples, info.sample_rate, devices=devs)
    got = [f for f in frames if f.frame_type in GOLDEN_TYPES]
    want = read_golden_frames(str(fixture_dir / f"{name}.json"))
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"{name}[{i}]: {g.diff(w)}"


def test_ppermute_halo_bitexact_vs_local(fixture_dir):
    """The halo a block receives over ICI (ppermute from the left-neighbour
    device) must be bit-identical to the halo materialized locally: channel
    arrays from the 8-device run equal the 1-device run exactly (same
    per-row math; only the halo transport differs)."""
    from nfclab.io.wav import read_wav
    from nfclab.shard.multichip import sharded_capture_channels

    devs = _devices(8)
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_002.wav"))
    ch8 = sharded_capture_channels(samples, info.sample_rate, devices=devs)
    ch1 = sharded_capture_channels(
        samples, info.sample_rate, devices=devs[:1]
    )
    assert set(ch8) == set(ch1)
    for k in ch8:
        np.testing.assert_array_equal(ch8[k], ch1[k], err_msg=k)


def test_sharded_matches_unsharded_walk(fixture_dir):
    """Sharded decode == the plain single-process decode (beyond golden
    frames: carrier events and frame order too)."""
    devs = _devices(8)
    from nfclab.io.wav import read_wav
    from nfclab.runtime.decoder import NfcDecoder
    from nfclab.shard.multichip import decode_sharded

    samples, info = read_wav(str(fixture_dir / "test_POLL_AB_001.wav"))
    sharded = decode_sharded(samples, info.sample_rate, devices=devs)
    plain = NfcDecoder().decode(samples, info.sample_rate)
    assert len(sharded) == len(plain)
    for g, w in zip(sharded, plain):
        assert g == w


def test_segmented_box_sum_precision():
    """The segmented-cumsum box sums must stay within a few ULPs of the
    exact f64 windowed sums — a plain W-long f32 cumsum difference drifts
    ~1e-3 absolute by the end of a 32k window, which flips
    threshold-adjacent decode samples (the bug this formulation fixes)."""
    _devices(1)
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    x = (rng.random((2, 32768), dtype=np.float32) * 0.4).astype(np.float32)

    # the same code path _sharded_step jits, extracted via a tiny jit
    def box_sum(xv, width, seg=512):
        r, w_len = xv.shape
        xs = xv.reshape(r, w_len // seg, seg)
        c = jnp.cumsum(xs, axis=-1)
        tails = c[..., -1]
        cprev = jnp.pad(c[:, :-1], ((0, 0), (1, 0), (0, 0)))
        tprev = jnp.pad(tails[:, :-1], ((0, 0), (1, 0)))
        o = jnp.arange(seg)
        case1 = c - jnp.roll(c, width, axis=-1)
        c2 = cprev[..., jnp.clip(o + seg - width, 0, seg - 1)]
        case2 = c + (tprev[..., None] - c2)
        return jnp.where(o >= width, case1, case2).reshape(r, w_len)

    for width in (12, 94, 189):
        got = np.asarray(jax.jit(box_sum, static_argnums=1)(x, width))
        c64 = np.cumsum(x.astype(np.float64), axis=-1)
        want = c64 - np.pad(c64[:, :-width], ((0, 0), (width, 0)))
        err = np.abs(got - want.astype(np.float32)).max()
        assert err < 5e-5, (width, err)


def test_channel_plan_matches_kernel_constants():
    """channel_plan(10 MS/s) must reproduce the fused kernel's constant
    tables (the rate-generic derivation and the kernel must never drift)."""
    from nfclab.dsp.pallas import fused_frontend as ff
    from nfclab.dsp.tpu_channels import channel_plan

    p = channel_plan(10_000_000)
    assert p["bv"] == tuple(sorted(ff.BV_WIDTHS))
    assert p["q"] == tuple(sorted(ff.Q_WIDTHS))
    assert sorted(p["pb"]) == sorted(ff.PB)
    assert p["a_rates"] == tuple(
        (d, gap, p2) for d, gap, p2, _ in ff.A_RATES
    )
    assert p["b_delays"] == tuple(ff.B_DELAYS)
    assert p["f_rates"] == tuple(
        (d, gap, p2) for d, gap, p2, _ in ff.F_RATES
    )
    assert p["v_rate"] == tuple(ff.V_RATE[:3])


def test_sharded_decode_generic_sample_rate(fixture_dir):
    """The mesh-sharded frontend is rate-parametric: a 5 MS/s capture
    (decimated fixture) decodes over the mesh identically to the plain
    host decoder at that rate."""
    devs = _devices(4)
    from nfclab.io.golden import GOLDEN_TYPES
    from nfclab.io.wav import read_wav
    from nfclab.runtime.decoder import NfcDecoder
    from nfclab.shard.multichip import decode_sharded

    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_002.wav"))
    s5 = np.ascontiguousarray(samples[::2])
    rate5 = info.sample_rate // 2
    plain = NfcDecoder().decode(s5, rate5)
    assert any(f.frame_type in GOLDEN_TYPES for f in plain)
    sharded = decode_sharded(s5, rate5, devices=devs)
    assert sharded == plain


def test_two_process_distributed_golden_decode(fixture_dir):
    """The distributed layer RUN FOR REAL: two OS processes, each with 4
    virtual CPU devices, joined by jax.distributed + gloo collectives into
    one 8-device world; shard/launch.py's host-major blocks mesh spans the
    process boundary, the sharded channel step's halo ppermute crosses it,
    and BOTH processes produce golden frames from the all-gathered
    channels (tests/dist_child.py).  BASELINE's multi-host row, certified
    rather than plausible."""
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    with socket.socket() as s:  # free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    wav = str(fixture_dir / "test_NFC-A_106kbps_001.wav")
    gold = str(fixture_dir / "test_NFC-A_106kbps_001.json")

    env = dict(os.environ)
    env["PYTHONPATH"] = str(repo) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(Path(__file__).parent / "dist_child.py"),
             str(pid), str(port), wav, gold],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(repo),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"DIST-GOLDEN-PASS proc={pid}" in out, out[-3000:]
