"""HTML trace report: the headless equivalent of the reference GUI's frame
table (StreamModel columns), parser detail tree, and wave views."""

import subprocess
import sys

import numpy as np
import pytest

from nfclab.dsp.resample import resample_radio
from nfclab.io.trz import SignalStream, write_trace
from nfclab.io.wav import read_wav
from nfclab.runtime.decoder import NfcDecoder
from nfclab.tools.html_report import render_html


@pytest.fixture(scope="module")
def decoded(fixture_dir):
    samples, info = read_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    frames = NfcDecoder().decode(samples, info.sample_rate)
    vals, offs = resample_radio(samples)
    stream = SignalStream(
        0, info.sample_rate, "radio", offs.astype(np.int64), vals, 0
    )
    return frames, stream


def test_render_html_contents(decoded):
    frames, stream = decoded
    page = render_html(frames, [stream], title="t")

    # frame table columns + tech + decoded command names (parser pass)
    for needle in (
        "<th>Delta</th>", "NFC-A", "WUPA", "SEL1", "radio stream 0",
        "<svg", "details class=\"tree\"",
    ):
        assert needle in page, needle
    # data bytes rendered
    assert "26" in page
    # frame spans overlay the wave strip
    assert "fr-span" in page
    # embedded machine-readable frame JSON
    assert 'id="frames-json"' in page


def test_trace_cli_html(decoded, tmp_path):
    frames, stream = decoded
    trz = tmp_path / "cap.trz"
    write_trace(str(trz), frames, [stream])
    out = tmp_path / "report.html"
    res = subprocess.run(
        [
            sys.executable, "-m", "nfclab.tools.trace_cli",
            str(trz), "--html", str(out),
        ],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    page = out.read_text()
    assert "NFC-A" in page and "<svg" in page and "WUPA" in page


def test_run_cli_html_with_spectrum(fixture_dir, tmp_path):
    """decode_cli run --html embeds the spectrum waterfall (frequencyView
    role) plus a wave strip rendered from the raw capture."""
    out = tmp_path / "report.html"
    res = subprocess.run(
        [
            sys.executable, "-m", "nfclab.apps.decode_cli", "run",
            str(fixture_dir / "test_NFC-A_106kbps_001.wav"),
            "--html", str(out),
        ],
        capture_output=True, text=True, timeout=180,
    )
    assert res.returncode == 0, res.stderr
    page = out.read_text()
    assert 'img class="waterfall"' in page
    assert "data:image/png;base64,iVBOR" in page
    assert "spectrum — test_NFC-A_106kbps_001" in page
    assert "WUPA" in page  # frames decoded on the same page
