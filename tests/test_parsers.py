"""Protocol detail parser tests: decode bundled fixtures and check the
protocol trees name the expected commands and fields (the test-parser
harness equivalent)."""

import pytest

from nfclab.io.golden import read_golden_frames
from nfclab.protocol.parser import ProtocolParser, parse_frames_to_json


def _parse_fixture(fixture_dir, name):
    frames = read_golden_frames(str(fixture_dir / f"{name}.json"))
    return frames, parse_frames_to_json(frames)


def test_nfca_tree(fixture_dir):
    frames, trees = _parse_fixture(fixture_dir, "test_NFC-A_106kbps_001")
    names = [t["name"] for t in trees]
    # capture: WUPA, ATQA, SEL1, SAK, AUTH ...
    assert "WUPA" in names
    assert "SEL1" in names
    assert any(n.startswith("AUTH") for n in names)
    sel = trees[names.index("SEL1")]
    child_names = [c["name"] for c in sel.get("children", [])]
    assert "NVB" in child_names
    assert "UID" in child_names or "CT" in child_names


def test_nfcb_tree(fixture_dir):
    frames, trees = _parse_fixture(fixture_dir, "test_NFC-B_106kbps_001")
    names = [t["name"] for t in trees]
    assert "REQB" in names or "WUPB" in names
    req = trees[[i for i, n in enumerate(names) if n in ("REQB", "WUPB")][0]]
    child_names = [c["name"] for c in req.get("children", [])]
    assert "AFI" in child_names and "PARAM" in child_names


def test_nfcf_tree(fixture_dir):
    frames, trees = _parse_fixture(fixture_dir, "test_NFC-F_212kbps_001")
    names = [t["name"] for t in trees]
    assert "REQC" in names
    req = trees[names.index("REQC")]
    child_names = [c["name"] for c in req.get("children", [])]
    assert "SC" in child_names and "TSN" in child_names


def test_nfcv_tree(fixture_dir):
    frames, trees = _parse_fixture(fixture_dir, "test_NFC-V_26kbps_001")
    names = [t["name"] for t in trees]
    assert "Inventory" in names
    inv = trees[names.index("Inventory")]
    child_names = [c["name"] for c in inv.get("children", [])]
    assert "FLAGS" in child_names


def test_iso7816_tree():
    from nfclab.core.frame import Frame, FrameTech, FrameType

    atr = Frame(
        tech_type=int(FrameTech.Iso7816Tech),
        frame_type=int(FrameType.IsoATRFrame),
        data=bytes([0x3B, 0x02, 0x41, 0x42]),
    )
    tpdu = Frame(
        tech_type=int(FrameTech.Iso7816Tech),
        frame_type=int(FrameType.IsoExchangeFrame),
        data=bytes([0x00, 0xA4, 0x04, 0x00, 0x02, 0xA4, 0x3F, 0x00, 0x90, 0x00]),
    )
    trees = parse_frames_to_json([atr, tpdu])
    assert trees[0]["name"] == "ATR"
    atr_children = [c["name"] for c in trees[0]["children"]]
    assert "TS" in atr_children and "T0" in atr_children and "HIST" in atr_children
    assert trees[1]["name"] == "TPDU"
    tp = [c["name"] for c in trees[1]["children"]]
    assert "CLA" in tp and "SW" in tp
