"""Randomized round-trip property tests over the validated waveform
synthesizers: for every tech, decode(synthesize(frames)) must reproduce
the frames byte-exact with clean flags.  Seeded RNG — failures reproduce.

The synths are individually validated against fixture-measured structure
(their own test files); this harness sweeps the payload space: random
lengths, random bytes (all 256 values reachable), many frames per capture
— the kind of coverage 18 curated captures cannot give the bit/character
state machines.
"""

import numpy as np
import pytest

from nfclab.core.frame import FrameFlags, FrameType
from nfclab.runtime.decoder import NfcDecoder


def _native_ok():
    from nfclab.native.binding import native_available

    return native_available()


pytestmark = pytest.mark.skipif(
    not _native_ok(), reason="native library unavailable"
)

RATE = 10_000_000


def _decode(sig, **enables):
    kw = dict(enable_nfca=False, enable_nfcb=False, enable_nfcf=False,
              enable_nfcv=False)
    kw.update(enables)
    frames = NfcDecoder(**kw).decode(np.asarray(sig, np.float32), RATE)
    return [
        f for f in frames
        if f.frame_type in (int(FrameType.NfcPollFrame),
                            int(FrameType.NfcListenFrame))
    ]


def _payload(rng, lo=1, hi=24) -> bytes:
    return bytes(rng.integers(0, 256, int(rng.integers(lo, hi))).tolist())


def _clean(frames):
    bad = FrameFlags.CrcError | FrameFlags.ParityError | FrameFlags.Truncated
    return all(not f.has_flags(bad) for f in frames)


def test_fuzz_nfca_polls():
    from nfca_synth import PollWriter, crc_a

    rng = np.random.default_rng(1)
    w = PollWriter()
    sent = []
    for _ in range(12):
        pay = _payload(rng)
        data = pay + crc_a(pay)
        w.frame(data)
        w.gap()
        sent.append(data)
    frames = _decode(w.build(), enable_nfca=True)
    assert [f.data for f in frames] == sent
    assert _clean(frames)


def test_fuzz_nfca_bpsk_exchanges():
    from nfca_bpsk_synth import A424Writer
    from nfca_synth import crc_a

    for rate_type, rate in ((1, 211875), (2, 423750)):
        rng = np.random.default_rng(10 + rate_type)
        w = A424Writer(rate_type=rate_type)
        sent = []
        for _ in range(6):
            pp, rp = _payload(rng), _payload(rng)
            poll, resp = pp + crc_a(pp), rp + crc_a(rp)
            w.frame(poll)
            w.listen_frame(resp, delay=int(rng.integers(850, 1000)))
            w.gap()
            sent += [poll, resp]
        frames = _decode(w.build(), enable_nfca=True)
        assert [f.data for f in frames] == sent, f"rate_type={rate_type}"
        assert all(f.frame_rate == rate for f in frames)
        assert _clean(frames)


def test_fuzz_nfcb_exchanges():
    from nfcb_synth import BListenWriter, crc_b

    rng = np.random.default_rng(2)
    w = BListenWriter()
    sent = []
    for _ in range(8):
        pp, rp = _payload(rng), _payload(rng)
        poll, resp = pp + crc_b(pp), rp + crc_b(rp)
        w.frame(poll)
        w.listen_frame(resp, delay=int(rng.integers(1800, 2400)))
        w.gap()
        sent += [poll, resp]
    frames = _decode(w.build(), enable_nfcb=True)
    assert [f.data for f in frames] == sent
    assert _clean(frames)


def test_fuzz_nfcf_exchanges():
    from nfcf_synth import FPollWriter, crc_f

    rng = np.random.default_rng(3)
    w = FPollWriter()
    sent = []
    for i in range(8):
        # FeliCa frames are LEN-prefixed; keep LEN consistent with size
        pb, rb = _payload(rng, 1, 20), _payload(rng, 1, 20)
        pbody = bytes([len(pb) + 1]) + pb
        rbody = bytes([len(rb) + 1]) + rb
        poll = pbody + crc_f(pbody)
        resp = rbody + crc_f(rbody)
        w.frame(poll, polarity=i & 1)
        w.listen_frame(resp, delay=int(rng.integers(3000, 8000)),
                       polarity=i & 1)
        w.gap()
        sent += [poll, resp]
    frames = _decode(w.build(), enable_nfcf=True)
    assert [f.data for f in frames] == sent
    assert _clean(frames)


def test_fuzz_nfcv_exchanges():
    from nfcv_synth import VListenWriter, crc_b

    rng = np.random.default_rng(4)
    w = VListenWriter()
    sent = []
    for _ in range(6):
        pp, rp = _payload(rng, 1, 12), _payload(rng, 1, 12)
        poll, resp = pp + crc_b(pp), rp + crc_b(rp)
        w.frame(poll)
        w.listen_frame(resp, delay=int(rng.integers(2500, 4000)))
        w.gap()
        sent += [poll, resp]
    frames = _decode(w.build(), enable_nfcv=True)
    assert [f.data for f in frames] == sent
    assert _clean(frames)


@pytest.mark.parametrize("rate", [8_000_000, 12_000_000])
def test_rate_generic_decode(rate, fixture_dir):
    """The decoder is sample-rate generic (bitrate tables, correlator
    widths and FWT windows all derive from the rate): a reference capture
    linearly resampled to another rate must reproduce the golden bytes
    exactly.  (5 MS/s is excluded by physics, not by the decoder: the
    848 kHz ASK-listen subcarrier is Nyquist-marginal through naive
    interpolation and the listen tails degrade.)"""
    from nfclab.io.golden import read_golden_frames
    from nfclab.io.wav import read_wav

    s, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    want = [
        f.data for f in read_golden_frames(
            str(fixture_dir / "test_NFC-A_106kbps_001.json")
        )
    ]
    n2 = int(len(s) * rate / info.sample_rate)
    t2 = np.arange(n2) * (info.sample_rate / rate)
    sig = np.interp(t2, np.arange(len(s)), s).astype(np.float32)
    got = [
        f.data for f in NfcDecoder().decode(sig, rate)
        if f.frame_type in (int(FrameType.NfcPollFrame),
                            int(FrameType.NfcListenFrame))
    ]
    assert got == want
