"""Full-tree parser golden regression (test-parser/main.cpp:96-140 parity).

The reference replays decoded-frame JSON through the GUI's ProtocolParser
and compares the COMPLETE dumped protocol tree; spot-checking a few node
names (tests/test_parsers.py) lets field-level regressions pass silently.
Here every bundled fixture's ground-truth frames parse to a full tree that
must equal the committed golden dump byte-for-byte; a missing golden is
created on first run (the reference's self-recording "TEST UPDATED"
scheme, test-sdr/main.cpp:196-218).

Regenerate after an intentional parser change by deleting
tests/goldens/parser/<fixture>.json and re-running.
"""

import json
from pathlib import Path

import pytest

from nfclab.io.golden import read_golden_frames
from nfclab.protocol.parser import parse_frames_to_json

GOLDEN_DIR = Path(__file__).parent / "goldens" / "parser"

from test_golden import ALL_FIXTURES  # the 18 bundled captures


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_parser_tree_golden(fixture_dir, name):
    frames = read_golden_frames(str(fixture_dir / f"{name}.json"))
    trees = parse_frames_to_json(frames)
    golden_path = GOLDEN_DIR / f"{name}.json"
    if not golden_path.exists():
        GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
        golden_path.write_text(json.dumps(trees, indent=1) + "\n")
        pytest.skip(f"TEST UPDATED: recorded {golden_path.name}")
    want = json.loads(golden_path.read_text())
    assert trees == want, (
        f"{name}: parser tree drifted from the committed golden; if the "
        f"change is intentional, delete {golden_path} and re-run"
    )
