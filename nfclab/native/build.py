"""Build the native (C++) runtime kernels into a shared library.

The reference implements its whole runtime in C++ (rt-lang/hw/lab layers); here
the native layer holds the bit-exact sequential oracle kernels and hot-loop
helpers, built on demand with g++ and loaded via ctypes (no pybind11 in this
environment).
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
from pathlib import Path

_SRC_DIR = Path(__file__).parent / "src"
_BUILD_DIR = Path(__file__).parent / "_build"

SOURCES = [
    "conditioner.cpp",
    "magnitude.cpp",
    "sdr_bridge.cpp",
    "detect_span.cpp",
    "channels.cpp",
    "decode_v.cpp",
    "decode_f.cpp",
    "decode_a.cpp",
    "decode_b.cpp",
    "usb_drivers.cpp",
    "usb_logic.cpp",
]
HEADERS = ["fsm_common.h", "bridge.h", "usb_api.h"]
LIB_NAME = "libnfclab_native.so"


def lib_path() -> Path:
    return _BUILD_DIR / LIB_NAME


CXXFLAGS = [
    "-O3",
    "-march=native",  # SIMD for the branch-free scans; exactness is
    # preserved by -fno-fast-math -ffp-contract=off (no FMA contraction,
    # no reassociation — vector lanes run the same IEEE ops).  -march=native
    # makes the artifact machine-specific; the stamp below includes the
    # host's uname so a copied _build/ rebuilds instead of SIGILLing.
    "-std=c++17",
    "-shared",
    "-fPIC",
    # keep strict IEEE fp so the oracle matches the reference float math
    "-fno-fast-math",
    "-ffp-contract=off",
]


def _stamp() -> str:
    import hashlib
    import platform

    key = " ".join(CXXFLAGS) + "|" + platform.machine() + platform.node()
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def build(force: bool = False) -> Path:
    """Compile the native library if missing or out of date (source mtimes,
    compiler flags, or build host changed). Returns its path."""
    out = lib_path()
    srcs = [_SRC_DIR / s for s in SOURCES]
    stamp_file = _BUILD_DIR / "flags.stamp"
    stamp = _stamp()
    if not force and out.exists():
        deps = srcs + [_SRC_DIR / h for h in HEADERS]
        newest_src = max(s.stat().st_mtime for s in deps)
        stamp_ok = stamp_file.exists() and stamp_file.read_text() == stamp
        if out.stat().st_mtime >= newest_src and stamp_ok:
            return out
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = ["g++", *CXXFLAGS, "-o", str(out), *[str(s) for s in srcs], "-ldl"]
    subprocess.run(cmd, check=True, capture_output=True)
    stamp_file.write_text(stamp)
    return out


if __name__ == "__main__":
    print(build(force=True))
