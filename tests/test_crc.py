from nfclab.protocol.crc import (
    check_crc_nfca,
    check_crc_nfcb,
    check_crc_nfcf,
    crc16_ccitt,
)


def test_crc_a_known_frames():
    # frames taken from the bundled golden captures
    assert check_crc_nfca(bytes([0x50, 0x00, 0x57, 0xCD]))  # HLTA
    assert check_crc_nfca(bytes([0x08, 0xB6, 0xDD]))  # SAK
    assert check_crc_nfca(bytes([0x60, 0x08, 0xBD, 0xF7]))  # AUTH
    assert not check_crc_nfca(bytes([0x50, 0x00, 0x57, 0xCE]))
    # short frames pass vacuously (NfcA.cpp:1982-1983)
    assert check_crc_nfca(b"\x26")
    assert check_crc_nfca(b"")


def test_crc_b_vector():
    # CRC_B of 0x0F:0xAA:0xFF = 0xD1FC, appended LSB first
    data = bytes([0x0F, 0xAA, 0xFF, 0xFC, 0xD1])
    assert check_crc_nfcb(data)
    assert not check_crc_nfcb(bytes([0x0F, 0xAA, 0xFF, 0xFC, 0xD2]))
    assert not check_crc_nfcb(b"\x01\x02")  # <3 bytes fails (NfcB.cpp:1276)


def test_crc_f_vector():
    # FeliCa check: normal CCITT init 0, big-endian trailer
    data = b"\x01\x02\x03"
    crc = crc16_ccitt(data, 0, 3, 0x0000, False)
    framed = data + bytes([(crc >> 8) & 0xFF, crc & 0xFF])
    assert check_crc_nfcf(framed)
    assert not check_crc_nfcf(framed[:-1] + b"\x00")


def test_empty_range_returns_complement():
    assert crc16_ccitt(b"", 0, 0, 0x6363, True) == (~0x6363) & 0xFFFF
