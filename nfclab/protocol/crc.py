"""CRC16-CCITT, normal and bit-reflected variants.

Parity with ``lab::Crc::ccitt16``
(src/nfc-lib/lib-lab/lab-data/src/main/cpp/Crc.cpp:96-113): table-driven, the
reflected (refin) variant is used by NFC-A (init 0x6363 — CRC_A of ISO14443-3)
and NFC-B/ISO (init 0xFFFF with final complement — CRC_B).  The tables are the
standard CCITT polynomial 0x1021 (normal) and its bit-reverse 0x8408, generated
here rather than hard-coded.
"""

from __future__ import annotations


def _gen_table_normal() -> list[int]:
    table = []
    for byte in range(256):
        crc = byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        table.append(crc)
    return table


def _gen_table_reflected() -> list[int]:
    table = []
    for byte in range(256):
        crc = byte
        for _ in range(8):
            crc = (crc >> 1) ^ 0x8408 if crc & 1 else crc >> 1
        table.append(crc)
    return table


_TABLE1 = _gen_table_normal()
_TABLE2 = _gen_table_reflected()


def crc16_ccitt(data: bytes, start: int, end: int, init: int, refin: bool) -> int:
    """CRC over data[start:end]; matches Crc.cpp:96-113 including the
    degenerate empty-range return of ~init."""
    crc = init & 0xFFFF
    if end - start <= 0:
        return (~init) & 0xFFFF
    if refin:
        for i in range(start, end):
            crc = (crc >> 8) ^ _TABLE2[(crc & 0xFF) ^ data[i]]
    else:
        for i in range(start, end):
            crc = ((crc << 8) & 0xFFFF) ^ _TABLE1[((crc >> 8) ^ data[i]) & 0xFF]
    return crc & 0xFFFF


def check_crc_nfca(data: bytes) -> bool:
    """NFC-A frame CRC check (tech/NfcA.cpp:1978-1989): CRC_A over all but the
    last two bytes, compared little-endian against the trailing two bytes.
    Frames shorter than 2 bytes pass."""
    size = len(data)
    if size < 2:
        return True
    crc = crc16_ccitt(data, 0, size - 2, 0x6363, True)
    res = data[size - 2] | (data[size - 1] << 8)
    return res == crc


def check_crc_nfcb(data: bytes) -> bool:
    """NFC-B / NFC-V CRC check (tech/NfcB.cpp:1272-1283, tech/NfcV.cpp:1194-1205):
    CRC_B = reflected, init 0xFFFF, output complemented, little-endian trailer.
    Frames shorter than 3 bytes FAIL (unlike NFC-A's pass)."""
    size = len(data)
    if size < 3:
        return False
    crc = (~crc16_ccitt(data, 0, size - 2, 0xFFFF, True)) & 0xFFFF
    res = data[size - 2] | (data[size - 1] << 8)
    return res == crc


check_crc_nfcv = check_crc_nfcb


def check_crc_nfcf(data: bytes) -> bool:
    """NFC-F / FeliCa CRC check (tech/NfcF.cpp:1215-1226): normal (non-reflected)
    CCITT, init 0x0000, BIG-endian trailer.  Frames shorter than 2 bytes FAIL."""
    size = len(data)
    if size < 2:
        return False
    crc = crc16_ccitt(data, 0, size - 2, 0x0000, False)
    res = (data[size - 2] << 8) | data[size - 1]
    return res == crc
