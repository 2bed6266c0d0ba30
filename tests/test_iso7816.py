"""ISO7816 logic decoder tests over synthesized captures.

The reference bundles no logic fixtures; these tests generate ISO7816-3
compliant 4-channel waveforms (VCC/RST power-up, TS+ATR, T=0 TPDU exchange)
and assert the decoded frames — the same self-recording golden scheme the
reference uses for its radio suite.
"""

import numpy as np
import pytest

from nfclab.core.frame import FrameFlags, FrameType
from nfclab.runtime.logic_decoder import IsoDecoder

SAMPLE_RATE = 24_000_000
CLOCK_HZ = 4_000_000
ETU_SAMPLES = SAMPLE_RATE * 372 // CLOCK_HZ  # Fi=372, Di=1 -> 2232 samples


class WaveBuilder:
    """Builds a 4-channel logic capture: IO=0, CLK=1, RST=2, VCC=3."""

    def __init__(self):
        self.chunks = []
        self.io = 1.0
        self.clk_on = False
        self.rst = 0.0
        self.vcc = 0.0
        self.t = 0

    def hold(self, samples: int):
        seg = np.zeros((samples, 4), np.float32)
        seg[:, 0] = self.io
        if self.clk_on:
            # square clock at CLOCK_HZ
            phase = ((np.arange(self.t, self.t + samples) * 2 * CLOCK_HZ)
                     // SAMPLE_RATE) & 1
            seg[:, 1] = phase.astype(np.float32)
        seg[:, 2] = self.rst
        seg[:, 3] = self.vcc
        self.chunks.append(seg)
        self.t += samples

    def character(self, byte: int, parity_error: bool = False):
        """start bit + 8 data bits (LSB first) + even parity + 2 etu stop."""
        bits = [0] + [(byte >> i) & 1 for i in range(8)]
        par = bin(byte).count("1") & 1
        if parity_error:
            par ^= 1
        bits.append(par)
        for b in bits:
            self.io = float(b)
            self.hold(ETU_SAMPLES)
        self.io = 1.0
        self.hold(2 * ETU_SAMPLES)

    def build(self) -> np.ndarray:
        return np.concatenate(self.chunks, axis=0)


def make_session(atr=(0x3B, 0x00), tpdu=None, idle_tail=300_000):
    w = WaveBuilder()
    w.hold(1000)  # everything down
    w.vcc = 1.0
    w.hold(1000)  # VCC up
    w.clk_on = True
    w.hold(1000)  # clock starts
    w.rst = 1.0
    w.hold(5000)  # RST rises; card answers after some delay
    for b in atr:
        w.character(b)
    atr_end = w.t
    w.hold(80_000)  # inter-frame gap (> character waiting time would timeout)
    if tpdu:
        for b in tpdu:
            w.character(b)
    w.hold(idle_tail)
    return w.build()


def test_atr_direct_convention():
    # TS=0x3B, T0=0x00 (no interface bytes, 0 historical bytes)
    capture = make_session(atr=(0x3B, 0x00))
    frames = IsoDecoder().decode(capture, SAMPLE_RATE)
    atr = [f for f in frames if f.frame_type == int(FrameType.IsoATRFrame)]
    assert len(atr) == 1
    assert atr[0].data == bytes([0x3B, 0x00])
    assert not atr[0].has_flags(FrameFlags.ParityError)
    # line events present
    kinds = {f.frame_type for f in frames}
    assert int(FrameType.IsoVccHigh) in kinds
    assert int(FrameType.IsoRstHigh) in kinds


def test_atr_with_historical_bytes():
    # TS, T0 with 2 historical bytes
    capture = make_session(atr=(0x3B, 0x02, 0x41, 0x42))
    frames = IsoDecoder().decode(capture, SAMPLE_RATE)
    atr = [f for f in frames if f.frame_type == int(FrameType.IsoATRFrame)]
    assert len(atr) == 1
    assert atr[0].data == bytes([0x3B, 0x02, 0x41, 0x42])


def test_t0_tpdu_exchange():
    # SELECT-like TPDU: CLA INS P1 P2 P3 + proc byte (=INS) + data + SW1 SW2
    tpdu = [0x00, 0xA4, 0x04, 0x00, 0x02, 0xA4, 0x3F, 0x00, 0x90, 0x00]
    capture = make_session(atr=(0x3B, 0x00), tpdu=tpdu)
    frames = IsoDecoder().decode(capture, SAMPLE_RATE)
    ex = [f for f in frames if f.frame_type == int(FrameType.IsoExchangeFrame)]
    assert len(ex) == 1
    assert ex[0].data == bytes(tpdu)
    assert not ex[0].has_flags(FrameFlags.ParityError)


def test_t1_protocol_switch_and_block():
    """PPS negotiates T=1, then an I-Block exchange decodes as
    request/response blocks (Iso7816.cpp:759-796, 1174-1230)."""
    w = WaveBuilder()
    w.hold(1000)
    w.vcc = 1.0
    w.hold(1000)
    w.clk_on = True
    w.hold(1000)
    w.rst = 1.0
    w.hold(5000)
    # ATR: TS, T0 with TD1 present, TD1 = T=1, TCK (xor of T0..TD1)
    for b in (0x3B, 0x80, 0x01, 0x80 ^ 0x01):
        w.character(b)
    w.hold(80_000)
    # PPS request: FF 11 11 FF (PPS1 present, T=1, Fi=1/Di=1)
    for b in (0xFF, 0x11, 0x11, 0xFF):
        w.character(b)
    w.hold(80_000)
    # PPS response (echo)
    for b in (0xFF, 0x11, 0x11, 0xFF):
        w.character(b)
    w.hold(80_000)
    # T=1 I-Block: NAD=00 PCB=00 LEN=02 INF=A4:04 LRC=xor(PCB..INF)=A2
    iblock = [0x00, 0x00, 0x02, 0xA4, 0x04, 0x00 ^ 0x02 ^ 0xA4 ^ 0x04]
    for b in iblock:
        w.character(b)
    w.hold(80_000)
    # response I-Block: NAD=00 PCB=00 LEN=01 INF=90 LRC=..
    rblock = [0x00, 0x00, 0x01, 0x90, 0x00 ^ 0x01 ^ 0x90]
    for b in rblock:
        w.character(b)
    w.hold(300_000)

    frames = IsoDecoder().decode(w.build(), SAMPLE_RATE)
    types = [f.frame_type for f in frames]
    assert int(FrameType.IsoATRFrame) in types
    reqs = [f for f in frames if f.frame_type == int(FrameType.IsoRequestFrame)]
    resps = [f for f in frames if f.frame_type == int(FrameType.IsoResponseFrame)]
    # PPS request + I-Block request; PPS response + I-Block response
    assert bytes([0xFF, 0x11, 0x11, 0xFF]) in [f.data for f in reqs]
    assert bytes(iblock) in [f.data for f in reqs]
    assert bytes(rblock) in [f.data for f in resps]
    for f in reqs + resps:
        assert not f.has_flags(FrameFlags.CrcError)


def test_parity_error_flagged():
    # T=0: a parity error causes the receiver to pull the error signal low;
    # here the character repeats with good parity is not modeled, so the
    # decoder should still accept the stop bit (io stays high) and flag it
    w = WaveBuilder()
    w.hold(1000)
    w.vcc = 1.0
    w.hold(1000)
    w.clk_on = True
    w.hold(1000)
    w.rst = 1.0
    w.hold(5000)
    w.character(0x3B)
    w.character(0x00, parity_error=True)
    w.hold(300_000)
    capture = w.build()
    frames = IsoDecoder().decode(capture, SAMPLE_RATE)
    atr = [f for f in frames if f.frame_type == int(FrameType.IsoATRFrame)]
    assert len(atr) == 1
    assert atr[0].has_flags(FrameFlags.ParityError)


@pytest.mark.parametrize("block", [65536, 17001])
def test_streaming_iso_matches_batch(block):
    """Chunked feeds through StreamingIsoDecoder equal the one-shot decode
    (T=0 session with ATR + TPDU exchange)."""
    from nfclab.runtime.logic_decoder import IsoDecoder, StreamingIsoDecoder

    capture = make_session(
        atr=(0x3B, 0x00), tpdu=[0x00, 0xA4, 0x04, 0x00, 0x00, 0x90, 0x00]
    )
    want = IsoDecoder().decode(capture, SAMPLE_RATE)

    dec = StreamingIsoDecoder(SAMPLE_RATE, channels=capture.shape[1])
    got = []
    for off in range(0, len(capture), block):
        got.extend(dec.feed(capture[off : off + block]))
    got.extend(dec.finish())

    key = lambda f: (f.sample_start, f.sample_end, f.frame_type)
    assert sorted(got, key=key) == sorted(want, key=key)
    # frames appeared before the final feed (incremental emission)
    assert len(got) == len(want) and len(want) > 0


def test_streaming_device_frontend_matches_host():
    """The device logic frontend (packed event-mask bits, dsp/logic_frontend)
    yields exactly the host scans' index sets and identical frames."""
    from tests.conftest import ensure_cpu_devices

    ensure_cpu_devices()
    from nfclab.runtime.logic_decoder import IsoDecoder, StreamingIsoDecoder

    capture = make_session(
        atr=(0x3B, 0x00), tpdu=[0x00, 0xA4, 0x04, 0x00, 0x00, 0x90, 0x00]
    )
    want = IsoDecoder().decode(capture, SAMPLE_RATE)

    host = StreamingIsoDecoder(SAMPLE_RATE, channels=4, frontend="host")
    dev = StreamingIsoDecoder(SAMPLE_RATE, channels=4, frontend="device")
    got = []
    block = 50_001  # uneven blocks cross character/event boundaries
    for off in range(0, len(capture), block):
        host.feed(capture[off : off + block])
        got.extend(dev.feed(capture[off : off + block]))
    got.extend(dev.finish())

    # event index sets identical to the host scans (bit-exact edge math)
    for name in ("io_edges", "io_falls", "line_edges", "clk_falls"):
        assert np.array_equal(
            host._idx[name].view(), dev._idx[name].view()
        ), name
    key = lambda f: (f.sample_start, f.sample_end, f.frame_type)
    assert sorted(got, key=key) == sorted(want, key=key)
    assert len(want) > 0


def test_logic_event_mask_chunk_carry():
    """Chunked masks with carried state equal one monolithic pass."""
    from tests.conftest import ensure_cpu_devices

    ensure_cpu_devices()
    from nfclab.dsp.logic_frontend import event_indices, logic_event_mask

    rng = np.random.default_rng(7)
    wave = (rng.random((4096, 4)) > 0.7).astype(np.float32)
    whole, _ = logic_event_mask(wave)
    whole = np.asarray(whole)

    carry = None
    pieces = []
    for off in range(0, len(wave), 1000):
        m, carry = logic_event_mask(wave[off : off + 1000], carry)
        pieces.append(np.asarray(m))
    assert np.array_equal(np.concatenate(pieces), whole)

    idx = event_indices(whole, base=5)
    assert set(idx) == {"io_edges", "io_falls", "line_edges", "clk_falls"}
    assert all((v >= 5).all() for v in idx.values())
