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

    def character_inverse(self, byte: int):
        """Inverse-convention character (ISO7816-3 §8.1): bits MSB first,
        logic level inverted (state A = logic 1); even parity, also
        inverted on the wire."""
        bits = [0] + [1 - ((byte >> (7 - i)) & 1) for i in range(8)]
        par = bin(byte).count("1") & 1
        bits.append(1 - par)
        for b in bits:
            self.io = float(b)
            self.hold(ETU_SAMPLES)
        self.io = 1.0
        self.hold(2 * ETU_SAMPLES)

    def character_with_error_signal(self, byte: int):
        """T=0 error signaling (ISO7816-3 §10.3.2): the receiver pulls IO
        low during the stop moment, asking for retransmission — the decoder
        must drop this character and accept the repeat."""
        bits = [0] + [(byte >> i) & 1 for i in range(8)]
        par = bin(byte).count("1") & 1
        bits.append(par)
        for b in bits:
            self.io = float(b)
            self.hold(ETU_SAMPLES)
        self.io = 0.0  # error signal low at the stop moment
        self.hold(ETU_SAMPLES)
        self.io = 1.0
        self.hold(2 * ETU_SAMPLES)

    def build(self) -> np.ndarray:
        return np.concatenate(self.chunks, axis=0)


def _session_head() -> WaveBuilder:
    w = WaveBuilder()
    w.hold(1000)
    w.vcc = 1.0
    w.hold(1000)
    w.clk_on = True
    w.hold(1000)
    w.rst = 1.0
    w.hold(5000)
    return w


def _t1_crc(payload: bytes) -> bytes:
    """ISO13239 CRC epilogue as _check_crc expects (Iso7816.cpp:1603-1614):
    inverted CRC16-CCITT (reflected, init 0xFFFF), little-endian."""
    from nfclab.protocol.crc import crc16_ccitt

    crc = (~crc16_ccitt(payload, 0, len(payload), 0xFFFF, True)) & 0xFFFF
    return bytes([crc & 0xFF, crc >> 8])


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


# ----------------------------------------------------- adversarial coverage
# (Iso7816.cpp:801-950 / :1028-1169 behaviors the happy-path tests miss)


def test_inverse_convention_end_to_end():
    """TS = 0x3F: every subsequent character arrives MSB-first with inverted
    levels (Iso7816.cpp:442-489 convention switch); the ATR and a full T=0
    TPDU must decode identically to a direct-convention session."""
    w = _session_head()
    # TS inverse + T0 (one historical byte) + historical
    for b in (0x3F, 0x01, 0xA5):
        w.character_inverse(b)
    w.hold(80_000)
    tpdu = [0x00, 0xB0, 0x00, 0x00, 0x01, 0xB0, 0x42, 0x90, 0x00]
    for b in tpdu:
        w.character_inverse(b)
    w.hold(300_000)
    frames = IsoDecoder().decode(w.build(), SAMPLE_RATE)
    atr = [f for f in frames if f.frame_type == int(FrameType.IsoATRFrame)]
    assert len(atr) == 1
    assert atr[0].data == bytes([0x3F, 0x01, 0xA5])
    assert not atr[0].has_flags(FrameFlags.ParityError)
    ex = [f for f in frames if f.frame_type == int(FrameType.IsoExchangeFrame)]
    assert len(ex) == 1
    assert ex[0].data == bytes(tpdu)
    assert not ex[0].has_flags(FrameFlags.ParityError)


def test_t0_error_signal_retransmission():
    """A character answered with the T=0 error signal (IO low at the stop
    moment) is dropped by the decoder; the retransmitted character is the
    one that lands in the frame (Iso7816.cpp:860-880 stop-bit branch)."""
    tpdu = [0x00, 0xA4, 0x04, 0x00, 0x02, 0xA4, 0x3F, 0x00, 0x90, 0x00]
    w = _session_head()
    w.character(0x3B)
    w.character(0x00)
    w.hold(80_000)
    for i, b in enumerate(tpdu):
        if i == 3:
            # receiver rejects this byte once; transmitter repeats it
            w.character_with_error_signal(b)
        w.character(b)
    w.hold(300_000)
    frames = IsoDecoder().decode(w.build(), SAMPLE_RATE)
    ex = [f for f in frames if f.frame_type == int(FrameType.IsoExchangeFrame)]
    assert len(ex) == 1
    assert ex[0].data == bytes(tpdu)  # the rejected byte appears only once
    assert not ex[0].has_flags(FrameFlags.ParityError)


def _xor(bs):
    out = 0
    for b in bs:
        out ^= b
    return out


def test_t1_crc_mode():
    """ATR TC3 bit 0 selects the CRC epilogue for T=1 (the reference logs
    but never applies it, Iso7816.cpp:1098-1102); blocks carrying the
    ISO13239 CRC must frame correctly and check clean, and a corrupted
    CRC must flag CrcError."""
    w = _session_head()
    # TS T0(TD1) TD1(TD2 present, T=1) TD2(TC3 present, T=1) TC3(CRC) TCK
    atr = [0x3B, 0x80, 0x81, 0x41, 0x01]
    atr.append(_xor(atr[1:]))
    for b in atr:
        w.character(b)
    w.hold(80_000)
    for b in (0xFF, 0x11, 0x11, 0xFF):  # PPS request: T=1
        w.character(b)
    w.hold(80_000)
    for b in (0xFF, 0x11, 0x11, 0xFF):  # PPS response
        w.character(b)
    w.hold(80_000)
    # I-Block with CRC epilogue: NAD PCB LEN INF[2] CRC16lo CRC16hi
    core = bytes([0x00, 0x00, 0x02, 0xA4, 0x04])
    iblock = core + _t1_crc(core)
    for b in iblock:
        w.character(b)
    w.hold(80_000)
    # response block with a CORRUPTED CRC
    core2 = bytes([0x00, 0x00, 0x01, 0x90])
    bad = bytearray(core2 + _t1_crc(core2))
    bad[-1] ^= 0xFF
    for b in bad:
        w.character(b)
    w.hold(300_000)
    frames = IsoDecoder().decode(w.build(), SAMPLE_RATE)
    atrf = [f for f in frames if f.frame_type == int(FrameType.IsoATRFrame)]
    assert len(atrf) == 1 and atrf[0].data == bytes(atr)
    assert not atrf[0].has_flags(FrameFlags.CrcError)
    blocks = {
        f.data: f
        for f in frames
        if f.frame_type
        in (int(FrameType.IsoRequestFrame), int(FrameType.IsoResponseFrame))
    }
    assert iblock in blocks  # framed at LEN+3+2: CRC epilogue length applied
    assert not blocks[iblock].has_flags(FrameFlags.CrcError)
    assert bytes(bad) in blocks
    assert blocks[bytes(bad)].has_flags(FrameFlags.CrcError)


def test_t1_wtx_sblocks():
    """S(WTX) request/response blocks (PCB 0xC3/0xE3) decode as T=1 frames
    with clean LRC — waiting-time extension traffic must not derail the
    block framing."""
    w = _session_head()
    for b in (0x3B, 0x80, 0x01, 0x80 ^ 0x01):
        w.character(b)
    w.hold(80_000)
    for b in (0xFF, 0x11, 0x11, 0xFF):
        w.character(b)
    w.hold(80_000)
    for b in (0xFF, 0x11, 0x11, 0xFF):
        w.character(b)
    w.hold(80_000)
    seq = []
    ib = [0x00, 0x00, 0x02, 0xA4, 0x04]
    seq.append(ib + [_xor(ib)])
    wtx_req = [0x00, 0xC3, 0x01, 0x01]
    seq.append(wtx_req + [_xor(wtx_req)])
    wtx_resp = [0x00, 0xE3, 0x01, 0x01]
    seq.append(wtx_resp + [_xor(wtx_resp)])
    rb = [0x00, 0x00, 0x01, 0x90]
    seq.append(rb + [_xor(rb)])
    for block in seq:
        for b in block:
            w.character(b)
        w.hold(80_000)
    w.hold(300_000)
    frames = IsoDecoder().decode(w.build(), SAMPLE_RATE)
    datas = [
        f.data
        for f in frames
        if f.frame_type
        in (int(FrameType.IsoRequestFrame), int(FrameType.IsoResponseFrame))
    ]
    for block in seq:
        assert bytes(block) in datas
    for f in frames:
        assert not f.has_flags(FrameFlags.CrcError)


def test_channel_map_permuted_capture_decodes_identically():
    """LogicDecoderTask channel-mapping parity: a capture wired with probes
    in a different order decodes identically once the channel_map names the
    wiring — one-shot, streaming, and via the map-normalization helper."""
    import numpy as np

    from nfclab.runtime.logic_decoder import (
        StreamingIsoDecoder,
        normalize_channel_map,
    )

    capture = make_session(
        atr=(0x3B, 0x00), tpdu=(0x00, 0xB0, 0x00, 0x00, 0x02)
    )
    want = IsoDecoder().decode(capture, SAMPLE_RATE)
    assert want

    # wire the probes as [clk, rst, vcc, io] (physical order); the map
    # names the physical probe index each role landed on
    wired = np.ascontiguousarray(capture[:, [1, 2, 3, 0]])
    cmap = {"io": 3, "clk": 0, "rst": 1, "vcc": 2}

    got = IsoDecoder(channel_map=cmap).decode(wired, SAMPLE_RATE)
    assert got == want

    # sequence form [io, clk, rst, vcc]
    got2 = IsoDecoder(channel_map=[3, 0, 1, 2]).decode(wired, SAMPLE_RATE)
    assert got2 == want

    # streaming decoder, chunked feeds
    sdec = StreamingIsoDecoder(SAMPLE_RATE, channel_map=cmap)
    frames = []
    for lo in range(0, len(wired), 1 << 16):
        frames += sdec.feed(wired[lo : lo + (1 << 16)])
    frames += sdec.finish()
    assert frames == want

    # identity map normalizes away; bad maps rejected
    assert normalize_channel_map({"io": 0}, 4) is None
    with pytest.raises(ValueError):
        normalize_channel_map([0, 0, 1, 2], 4)
    with pytest.raises(ValueError):
        normalize_channel_map({"io": 9}, 4)


def test_fuzz_t0_tpdu_exchanges():
    """Randomized T=0 property sweep: random CLA/P1/P2, random data of
    P3 length, random SW — every exchange must reassemble byte-exact with
    clean flags (seeded; failures reproduce)."""
    rng = np.random.default_rng(7)
    w = _session_head()
    for b in (0x3B, 0x00):
        w.character(b)
    w.hold(80_000)
    sent = []
    for _ in range(6):
        ins = 0xA4            # even, != 0x60/0x6X per ISO7816-3 T=0
        p3 = int(rng.integers(1, 12))
        data = [int(x) for x in rng.integers(0, 256, p3)]
        sw = [0x90, int(rng.integers(0, 256))]
        tpdu = [int(rng.integers(0, 256)) & 0xFE, ins,
                int(rng.integers(0, 256)), int(rng.integers(0, 256)),
                p3, ins] + data + sw
        for b in tpdu:
            w.character(b)
        w.hold(80_000)
        sent.append(bytes(tpdu))
    frames = IsoDecoder().decode(w.build(), SAMPLE_RATE)
    ex = [f for f in frames if f.frame_type == int(FrameType.IsoExchangeFrame)]
    assert [f.data for f in ex] == sent
    assert all(not f.has_flags(FrameFlags.ParityError) for f in ex)
