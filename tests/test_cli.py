"""CLI smoke tests (decode_cli, trace_cli) + config + debug tap + monitor."""

import json
import subprocess
import sys

import numpy as np


def _run(args, input_text=None):
    return subprocess.run(
        [sys.executable, "-m", *args],
        capture_output=True,
        text=True,
        input=input_text,
        timeout=300,
    )


def test_decode_cli_test_mode(fixture_dir):
    r = _run(
        ["nfclab.apps.decode_cli", "test", str(fixture_dir / "test_NFC-A_106kbps_001.wav")]
    )
    assert r.returncode == 0
    assert "PASS" in r.stdout


def test_decode_cli_json_pipe(fixture_dir):
    r = _run(
        [
            "nfclab.apps.decode_cli",
            "run",
            "--json",
            str(fixture_dir / "test_NFC-A_106kbps_001.wav"),
        ]
    )
    assert r.returncode == 0
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.strip()]
    polls = [l for l in lines if l.get("type") == "POLL"]
    assert len(polls) == 5
    r2 = _run(["nfclab.tools.trace_cli", "--no-carrier"], input_text=r.stdout)
    assert r2.returncode == 0
    assert "WUPA" in r2.stdout


def test_decoder_from_config():
    from nfclab.runtime.config import Config
    from nfclab.runtime.decoder import NfcDecoder

    cfg = Config({"decoder": {"protocol": {"nfcb": {"enabled": False}}}})
    dec = NfcDecoder.from_config(cfg)
    assert dec.enable_nfca and not dec.enable_nfcb


def test_debug_tap(tmp_path, fixture_dir):
    from nfclab.io.wav import read_wav
    from nfclab.runtime.decoder import NfcDecoder

    out = tmp_path / "debug.wav"
    dec = NfcDecoder(
        enable_nfcb=False,
        enable_nfcf=False,
        enable_nfcv=False,
        debug=True,
        debug_path=str(out),
    )
    dec.decode_wav(str(fixture_dir / "test_NFC-A_106kbps_001.wav"))
    data, info = read_wav(str(out))
    assert info.channels == 10
    assert len(data) == 114227


def test_device_monitor():
    import time

    from nfclab.hw.device import DeviceFactory
    from nfclab.runtime.pipeline import DeviceMonitorTask, Executor
    from nfclab.runtime.subject import Subject

    Subject.clear_registry()
    devices = ["mock://a"]
    DeviceFactory.register_device("mock", lambda: list(devices), lambda i: None)
    events = []
    mon = DeviceMonitorTask("mock", interval=0.05)
    mon.status.subscribe(events.append, replay=False)
    ex = Executor()
    ex.submit(mon)
    time.sleep(0.15)
    devices.append("mock://b")
    time.sleep(0.15)
    ex.shutdown()
    kinds = {(e["status"], e.get("device")) for e in events}
    assert ("attached", "mock://a") in kinds
    assert ("attached", "mock://b") in kinds


def test_decode_cli_logic_wav(tmp_path):
    """Multi-channel WAV captures route to the ISO7816 decoder (offline
    logic decode, the reference's IsoDecoder path) and render probe wave
    strips in the HTML report."""
    from test_iso7816 import SAMPLE_RATE, make_session

    from nfclab.io.wav import write_wav

    cap = make_session(atr=(0x3B, 0x00), tpdu=(0x00, 0xB0, 0x00, 0x00, 0x02))
    wav = tmp_path / "logic.wav"
    write_wav(str(wav), cap, SAMPLE_RATE, bits=8)
    out = tmp_path / "report.html"
    res = _run(["nfclab.apps.decode_cli", "run", str(wav), "--json",
                "--html", str(out)])
    assert res.returncode == 0, res.stderr
    frames = [json.loads(l) for l in res.stdout.splitlines()
              if l.startswith("{")]
    atr = [f for f in frames if f.get("type") == "ATR"]
    assert atr and atr[0]["data"] == "3b:00"
    page = out.read_text()
    assert page.count("probe stream") == 4  # one wave strip per probe


def test_malloc_tune_applies_and_is_idempotent():
    from nfclab.core.malloc_tune import malloc_tune

    assert malloc_tune() is True   # glibc on CI
    assert malloc_tune() is True   # second call is a no-op


def test_missing_input_friendly_error(capsys):
    from nfclab.apps.decode_cli import main

    assert main(["run", "/no/such/file.wav"]) == 1
    assert main(["test", "/no/such/dir/"]) == 1
    err = capsys.readouterr().err
    assert "no such file or directory" in err


def test_settings_store_roundtrip(tmp_path):
    """Persistent settings tier (the reference's nfc-lab.ini): merge-patch
    updates accumulate, writes are atomic, bad files read as empty."""
    from nfclab.runtime.config import SettingsStore

    store = SettingsStore(tmp_path / "settings.json")
    assert store.load() == {}
    store.update({"decoder": {"powerLevelThreshold": 0.02}})
    store.update({"decoder": {"protocol": {"nfca": {"enabled": False}}}})
    data = SettingsStore(tmp_path / "settings.json").load()
    assert data["decoder"]["powerLevelThreshold"] == 0.02
    assert data["decoder"]["protocol"]["nfca"]["enabled"] is False
    (tmp_path / "settings.json").write_text("not json")
    assert store.load() == {}


def test_live_settings_persist_roundtrip(tmp_path):
    """decode_cli live loads stored decoder settings, applies them via
    Query/diff/Configure, and writes the final state back at exit — a
    Configure change made in one session survives into the next."""
    import json
    import os
    import subprocess
    import sys

    settings = tmp_path / "settings.json"
    settings.write_text(json.dumps(
        {"decoder": {"powerLevelThreshold": 0.02,
                     "protocol": {"nfcf": {"enabled": False}}}}
    ))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, NFCLAB_SETTINGS=str(settings))
    res = subprocess.run(
        [sys.executable, "-m", "nfclab.apps.decode_cli", "live",
         "loopback://test", "--blocks", "3", "--timeout", "2"],
        capture_output=True, text=True, timeout=120, cwd=repo, env=env,
    )
    assert res.returncode == 0, res.stderr
    assert "decoder configured" in res.stderr
    saved = json.loads(settings.read_text())
    # the round trip preserved the stored settings through the live
    # decoder's Configure/Query surface
    assert saved["decoder"]["powerLevelThreshold"] == 0.02
    assert saved["decoder"]["protocol"]["nfcf"]["enabled"] is False
    assert saved["decoder"]["protocol"]["nfca"]["enabled"] is True
