"""WAV (RIFF) signal file reader/writer.

Parity with the reference's ``hw::RecordDevice``
(src/nfc-lib/lib-hw/hw-dev/src/main/cpp/hw/RecordDevice.cpp): RIFF/fmt/data
chunk parsing (:358-392), 8/16/32-bit integer and 32-bit float sample formats,
and the exact scale conversion to float32 (:282-330):

    int8  -> value / 2^7      int16 -> value / 2^15      int32 -> value / 2^31

Multi-channel data stays interleaved in a (samples, channels) array; radio
captures are 1-2 channels, logic-analyzer captures are 4+.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_IEEE_FLOAT = 3


@dataclass
class WavInfo:
    sample_rate: int
    channels: int
    bits: int
    sample_format: int  # 1 = PCM int, 3 = float


def read_wav(path: str) -> tuple[np.ndarray, WavInfo]:
    """Read a WAV file into a float32 array of shape (samples,) for mono or
    (samples, channels) otherwise, scaled like RecordDevice.cpp:282-299."""
    with open(path, "rb") as f:
        riff, _size, wave = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = None
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, csz = struct.unpack("<4sI", hdr)
            if cid == b"fmt ":
                fmt = f.read(csz)
            elif cid == b"data":
                data = f.read(csz)
            else:
                f.seek(csz + (csz & 1), 1)
        if fmt is None or data is None:
            raise ValueError(f"{path}: missing fmt/data chunk")

    afmt, nch, rate, _brate, _align, bits = struct.unpack("<HHIIHH", fmt[:16])
    info = WavInfo(sample_rate=rate, channels=nch, bits=bits, sample_format=afmt)

    if afmt == _WAVE_FORMAT_PCM and bits == 16:
        raw = np.frombuffer(data, dtype="<i2")
        samples = raw.astype(np.float32) / np.float32(1 << 15)
    elif afmt == _WAVE_FORMAT_PCM and bits == 8:
        # 8-bit WAV is unsigned with a 128 bias; the reference treats it as a
        # raw byte stream scaled by 2^7 after a signed reinterpretation
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = (raw.astype(np.int16) - 128).astype(np.float32) / np.float32(1 << 7)
    elif afmt == _WAVE_FORMAT_PCM and bits == 32:
        raw = np.frombuffer(data, dtype="<i4")
        samples = raw.astype(np.float32) / np.float32(1 << 31)
    elif afmt == _WAVE_FORMAT_IEEE_FLOAT and bits == 32:
        samples = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(f"{path}: unsupported format fmt={afmt} bits={bits}")

    if nch > 1:
        samples = samples[: (len(samples) // nch) * nch].reshape(-1, nch)
    return samples, info


def write_wav(path: str, samples: np.ndarray, sample_rate: int, bits: int = 16) -> None:
    """Write float32 samples to WAV, scaling like RecordDevice.cpp:310-330."""
    samples = np.asarray(samples, dtype=np.float32)
    nch = 1 if samples.ndim == 1 else samples.shape[1]
    flat = samples.reshape(-1)
    # saturate at positive full scale: +1.0 must store as the max code, not
    # wrap to the negative rail (logic captures are all-rails 0.0/1.0)
    if bits == 16:
        scaled = np.clip(flat * np.float32(1 << 15), -(1 << 15), (1 << 15) - 1)
        data = scaled.astype("<i2").tobytes()
    elif bits == 8:
        scaled = np.clip(flat * np.float32(1 << 7), -(1 << 7), (1 << 7) - 1)
        data = (scaled.astype(np.int8).view(np.uint8) + 128).astype(
            np.uint8
        ).tobytes()
    elif bits == 32:
        scaled = np.clip(
            flat.astype(np.float64) * (1 << 31), -(1 << 31), (1 << 31) - 1
        )
        data = scaled.astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported bits={bits}")

    block_align = nch * bits // 8
    byte_rate = sample_rate * block_align
    with open(path, "wb") as f:
        f.write(struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE"))
        f.write(
            struct.pack(
                "<4sIHHIIHH",
                b"fmt ",
                16,
                _WAVE_FORMAT_PCM,
                nch,
                sample_rate,
                byte_rate,
                block_align,
                bits,
            )
        )
        f.write(struct.pack("<4sI", b"data", len(data)))
        f.write(data)
