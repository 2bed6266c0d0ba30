"""Parser goldens beyond the fixture suite: synthesized frames for the
command space the 18 bundled captures never exercise.

The reference GUI parsers cover the FULL command tables (ParserNfcA.cpp,
ParserNfcB.cpp, ParserNfcV.cpp, ParserNfc.cpp ISO-DEP); the fixture
goldens only pin what real captures happen to contain.  Here each
synthesized exchange (request + response where the reference pairs them)
parses to a full tree, pinned byte-for-byte in
tests/goldens/parser/synthetic_commands.json (same self-recording scheme
as test_parser_golden.py).  Field layouts were cross-checked against the
reference parser sources cited per command below.
"""

import json
from pathlib import Path

from nfclab.core.frame import Frame, FrameTech, FrameType
from nfclab.protocol.parser import parse_frames_to_json

GOLDEN = Path(__file__).parent / "goldens" / "parser" / (
    "synthetic_commands.json"
)

POLL = int(FrameType.NfcPollFrame)
LISTEN = int(FrameType.NfcListenFrame)


def _f(tech, ftype, data_hex: str) -> Frame:
    return Frame(
        tech_type=int(tech), frame_type=ftype, frame_phase=0x0101,
        frame_rate=106_000, sample_rate=10_000_000,
        data=bytes.fromhex(data_hex.replace(" ", "")),
    )


def _a(ftype, h):
    return _f(FrameTech.NfcATech, ftype, h)


def _b(ftype, h):
    return _f(FrameTech.NfcBTech, ftype, h)


def _v(ftype, h):
    return _f(FrameTech.NfcVTech, ftype, h)


# Each entry: (label, [frames]) — label names the reference handler the
# synthesized bytes exercise.
EXCHANGES = [
    # --- NFC-A / ISO-DEP ---
    ("A AUTH(B) + encrypted chain (ParserNfcA.cpp:514-551)", [
        _a(POLL, "61 04 D1 3F"),
        _a(LISTEN, "1A 2B 3C 4D"),          # encrypted token
        _a(POLL, "8899AABBCCDDEEFF"),        # encrypted exchange continues
    ]),
    ("ISO-DEP S(DESELECT) pair (ParserNfc.cpp:241-278, PCB 11..010)", [
        _a(POLL, "C2 E0 B4"),
        _a(LISTEN, "C2 E0 B4"),
    ]),
    ("ISO-DEP S(WTX) with CID (ParserNfc.cpp:241-278)", [
        _a(POLL, "FA 01 4B 22 17"),          # PCB F2|08, CID 1, WTXM
        _a(LISTEN, "FA 01 4B 22 17"),
    ]),
    ("ISO-DEP R(NAK) (ParserNfc.cpp:196-239)", [
        _a(POLL, "B2 50 A1"),
    ]),
    ("ISO-DEP R(ACK) with CID (ParserNfc.cpp:196-239)", [
        _a(POLL, "AA 02 9C D4"),
    ]),
    ("A VASUP-A format 2.0 (ParserNfcA.cpp:553-651)", [
        _a(POLL, "6A 01 00 00 03 8D 11"),
    ]),
    # --- NFC-B ---
    ("B HLTB pair (ParserNfcB.cpp HLTB, command 0x50)", [
        _b(POLL, "50 11 22 33 44 AA BB"),
        _b(LISTEN, "00 CD EF"),
    ]),
    # --- NFC-V (ParserNfcV.cpp; addressed mode flags 0x22) ---
    ("V StayQuiet (ParserNfcV.cpp StayQuiet 0x02)", [
        _v(POLL, "22 02 03DDA3B1140104E0 9A 10"),
    ]),
    ("V WriteSingle + success (ParserNfcV.cpp WriteSingle 0x21)", [
        _v(POLL, "22 21 03DDA3B1140104E0 05 DEADBEEF 7C 31"),
        _v(LISTEN, "00 78 F0"),
    ]),
    ("V WriteMultiple FIRST/COUNT (ParserNfcV.cpp:473-500)", [
        _v(POLL, "22 24 03DDA3B1140104E0 04 01 0123456789ABCDEF 55 66"),
        _v(LISTEN, "00 78 F0"),
    ]),
    ("V LockBlock + locked error (ParserNfcV.cpp LockBlock 0x22, "
     "error table :300-320)", [
        _v(POLL, "22 22 03DDA3B1140104E0 07 12 AB"),
        _v(LISTEN, "01 11 34 CD"),          # error: block already locked
    ]),
    ("V Select (ParserNfcV.cpp:524-540)", [
        _v(POLL, "22 25 03DDA3B1140104E0 1F 02"),
        _v(LISTEN, "00 78 F0"),
    ]),
    ("V ResetToReady (ParserNfcV.cpp ResetToReady 0x26)", [
        _v(POLL, "22 26 03DDA3B1140104E0 90 21"),
    ]),
    ("V WriteAFI (ParserNfcV.cpp WriteAFI 0x27)", [
        _v(POLL, "22 27 03DDA3B1140104E0 C4 55 11"),
        _v(LISTEN, "00 78 F0"),
    ]),
    ("V LockAFI (ParserNfcV.cpp LockAFI 0x28)", [
        _v(POLL, "22 28 03DDA3B1140104E0 31 75"),
    ]),
    ("V WriteDSFID (ParserNfcV.cpp WriteDSFID 0x29)", [
        _v(POLL, "22 29 03DDA3B1140104E0 77 02 13"),
        _v(LISTEN, "00 78 F0"),
    ]),
    ("V LockDSFID (ParserNfcV.cpp LockDSFID 0x2A)", [
        _v(POLL, "22 2A 03DDA3B1140104E0 FE 60"),
    ]),
    ("V non-addressed ReadSingle (inventory-free, no UID; "
     "ParserNfcV.cpp:488 gate (flags & 0x24) == 0x20)", [
        _v(POLL, "02 20 0A 44 21"),
        _v(LISTEN, "00 CAFEBABE 11 22"),
    ]),
]


def test_synthetic_command_trees_golden():
    trees = []
    for label, frames in EXCHANGES:
        parsed = parse_frames_to_json(frames)
        assert len(parsed) == len(frames), label
        trees.append({"exchange": label, "trees": parsed})

    if not GOLDEN.exists():
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN.write_text(json.dumps(trees, indent=1) + "\n")
        import pytest

        pytest.skip(f"TEST UPDATED: recorded {GOLDEN.name}")
    want = json.loads(GOLDEN.read_text())
    assert trees == want, (
        "synthetic parser trees drifted; if intentional, delete "
        f"{GOLDEN} and re-run"
    )


def test_synthetic_commands_parse_to_expected_roots():
    """Independent of the golden dump: each exchange's root node names
    must identify the command (guards against the golden silently pinning
    an (unk) fallback parse)."""
    want_roots = {
        # the AUTH response is an unnamed AuthFrame node, exactly like
        # ParserNfcA.cpp:545-551's buildRootInfo("")
        "A AUTH(B)": ["AUTH(B)", "", "AUTH(B)"],
        "ISO-DEP S(DESELECT)": ["S(DESELECT)", "S(DESELECT)"],
        "ISO-DEP S(WTX)": ["S(WTX)", "S(WTX)"],
        "ISO-DEP R(NAK)": ["R(NAK)"],
        "ISO-DEP R(ACK)": ["R(ACK)"],
        "A VASUP-A": ["VASUP-A"],
        # HLTB's answer is an unnamed SenseFrame (ParserNfcB.cpp
        # parseResponseHLTB buildRootInfo(""))
        "B HLTB": ["HLTB", ""],
        "V StayQuiet": ["StayQuiet"],
        "V WriteSingle": ["WriteSingle", ""],
        "V WriteMultiple": ["WriteMultiple", ""],
        "V LockBlock": ["LockBlock", ""],
        "V Select": ["Select", ""],
        "V ResetToReady": ["ResetToReady"],
        "V WriteAFI": ["WriteAFI", ""],
        "V LockAFI": ["LockAFI"],
        "V WriteDSFID": ["WriteDSFID", ""],
        "V LockDSFID": ["LockDSFID"],
        "V non-addressed ReadSingle": ["ReadSingle", ""],
    }
    for label, frames in EXCHANGES:
        key = next((k for k in want_roots if label.startswith(k)), None)
        assert key is not None, f"no root expectation for {label!r}"
        roots = [t["name"] for t in parse_frames_to_json(frames)]
        assert roots == want_roots[key], (label, roots)
