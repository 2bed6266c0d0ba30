"""Fused Pallas frontend validation (TPU only; subprocess because the pytest
session pins JAX to CPU, where the TPU Pallas kernel cannot run)."""

import os
import subprocess
import sys

import pytest


def _tpu_available() -> bool:
    probe = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; print(jax.devices()[0].platform)",
        ],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return probe.returncode == 0 and "cpu" not in probe.stdout


@pytest.mark.skipif(
    os.environ.get("NFCLAB_TPU_TESTS", "") != "1",
    reason="TPU validation is opt-in (NFCLAB_TPU_TESTS=1); first compile is slow",
)
def test_fused_frontend_matches_unfused_on_tpu():
    if not _tpu_available():
        pytest.skip("no TPU device")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "nfclab.tools.validate_fused"],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=repo,
    )
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.skipif(
    os.environ.get("NFCLAB_TPU_TESTS", "") != "1",
    reason="TPU validation is opt-in (NFCLAB_TPU_TESTS=1); first compile is slow",
)
def test_tpu_stream_farm_matches_goldens():
    """Concurrent multi-stream decode with carried kernel state
    (tools/validate_tpu_farm)."""
    if not _tpu_available():
        pytest.skip("no TPU device")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "nfclab.tools.validate_tpu_farm"],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=repo,
    )
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.skipif(
    os.environ.get("NFCLAB_TPU_TESTS", "") != "1",
    reason="TPU validation is opt-in (NFCLAB_TPU_TESTS=1); first compile is slow",
)
def test_tpu_fed_decode_matches_goldens():
    """Fused-kernel channels + detect indices feed the host walk; frames
    must stay golden-equal (tools/validate_tpu_decode)."""
    if not _tpu_available():
        pytest.skip("no TPU device")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "nfclab.tools.validate_tpu_decode"],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=repo,
    )
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.skipif(
    os.environ.get("NFCLAB_TPU_TESTS", "") != "1",
    reason="TPU validation is opt-in (NFCLAB_TPU_TESTS=1); first compile is slow",
)
def test_tpu_logic_frontend_matches_host():
    """Device logic event-mask frontend: index sets + frames equal the host
    path (tools/validate_tpu_logic)."""
    if not _tpu_available():
        pytest.skip("no TPU device")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "nfclab.tools.validate_tpu_logic"],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=repo,
    )
    assert res.returncode == 0, res.stdout + res.stderr
