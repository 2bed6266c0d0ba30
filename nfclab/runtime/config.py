"""Configuration tree with JSON merge-patch semantics.

Parity with the reference's three-tier config (SURVEY.md §5): persistent
settings file, per-task JSON Configure commands applied with merge-patch
(RadioDecoderTask.cpp:207-366), and the app-rx desired-vs-actual recursive
diff (app-rx/main.cpp:323-345).
"""

from __future__ import annotations

import copy
import json
from pathlib import Path
from typing import Any


def merge_patch(target: dict, patch: dict) -> dict:
    """RFC7386-style merge patch (the semantics of the reference's JSON
    config merges): dict values merge recursively, None deletes, scalars
    replace."""
    out = copy.deepcopy(target)
    for k, v in patch.items():
        if v is None:
            out.pop(k, None)
        elif isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_patch(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def detect_changes(status: Any, desired: Any) -> Any:
    """Recursive diff: the subset of `desired` that differs from `status`
    (app-rx/main.cpp:323-345 detectChanges); None when nothing differs."""
    if isinstance(desired, dict) and isinstance(status, dict):
        out = {}
        for k, v in desired.items():
            if k not in status:
                out[k] = v
            else:
                d = detect_changes(status[k], v)
                if d is not None:
                    out[k] = d
        return out or None
    if status != desired:
        return desired
    return None


DEFAULT_CONFIG: dict = {
    "decoder": {
        "debugEnabled": False,
        "powerLevelThreshold": 0.01,
        "protocol": {
            "nfca": {"enabled": True},
            "nfcb": {"enabled": True},
            "nfcf": {"enabled": True},
            "nfcv": {"enabled": True},
            "iso7816": {"enabled": True},
        },
    },
    "fourier": {"length": 1024, "window": "hamming", "bandwidth": 10e6},
}


class SettingsStore:
    """Persistent settings tier — the reference's ``nfc-lab.ini``
    (README.md:100-252, app-qt main.cpp:119-133 QSettings): device /
    decoder / logic settings survive across sessions.  JSON instead of
    ini (consistent with the Configure wire format), stored at
    ``~/.config/nfclab/settings.json`` unless ``NFCLAB_SETTINGS`` or an
    explicit path overrides it.  Writes are atomic (tmp + rename)."""

    def __init__(self, path: str | Path | None = None):
        import os

        self.path = Path(
            path
            or os.environ.get("NFCLAB_SETTINGS")
            or Path.home() / ".config" / "nfclab" / "settings.json"
        )

    def load(self) -> dict:
        try:
            with open(self.path, encoding="utf-8") as f:
                data = json.load(f)
            return data if isinstance(data, dict) else {}
        except (OSError, ValueError):
            return {}

    def save(self, data: dict) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write("\n")
        tmp.replace(self.path)

    def update(self, patch: dict) -> dict:
        """Merge-patch `patch` into the stored settings; returns the new
        tree (live Configure changes persist through this — the monitor's
        Configure POSTs survive a restart)."""
        data = merge_patch(self.load(), patch)
        self.save(data)
        return data


class Config:
    def __init__(self, base: dict | None = None):
        self.data = merge_patch(DEFAULT_CONFIG, base or {})

    @classmethod
    def load(cls, path: str | Path) -> "Config":
        with open(path) as f:
            return cls(json.load(f))

    def patch(self, patch: dict):
        self.data = merge_patch(self.data, patch)

    def get(self, dotted: str, default=None):
        node = self.data
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node
