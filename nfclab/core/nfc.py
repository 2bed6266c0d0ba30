"""NFC air-interface constants.

Parity with the reference's ``lab/nfc/Nfc.h``
(src/nfc-lib/lib-lab/lab-radio/src/main/include/lab/nfc/Nfc.h:27-170).
All guard/wait times are expressed in 1/fc carrier-cycle units unless noted.
"""

# bitrate indices (Nfc.h:27-33)
R106K = 0
R212K = 1
R424K = 2
R848K = 3

# carrier frequency (Nfc.h:36)
NFC_FC = 13.56e6
# subcarrier frequency fc/16 = 847.5 kHz (Nfc.h:39)
NFC_FS = NFC_FC / 16
# elementary time unit (Nfc.h:42)
NFC_ETU = 128 / NFC_FC

# activation frame waiting time (Nfc.h:45)
NFC_FWT_ACTIVATION = 71680

# FSDI -> FSD frame-size table (Nfc.h:48)
NFC_FDS_TABLE = (16, 24, 32, 40, 48, 64, 96, 128, 256, 512, 1024, 2048, 4096, 0, 0, 0)

# SFGT = 256 x 16 * 2^SFGI in 1/fc units (Nfc.h:51)
NFC_SFGT_TABLE = tuple(4096 << n for n in range(16))
# FWT = 256 x 16 * 2^FWI in 1/fc units (Nfc.h:54)
NFC_FWT_TABLE = tuple(4096 << n for n in range(16))

# --- NFC-A (Nfc.h:61-73) ---
NFCA_FGT_DEF = 1024
NFCA_FWT_DEF = 256 * 16 * (1 << 4)
NFCA_SFGT_DEF = 256 * 16 * (1 << 0)
NFCA_RGT_DEF = 7000
NFCA_FWT_ATQA = 128 * 18

# --- NFC-B (Nfc.h:80-122) ---
NFCB_TR0_MIN = 1024
NFCB_TR1_MIN = 1024
NFCB_TR1_MAX = 3200
NFCB_TLISTEN_S1_MIN = 1272
NFCB_TLISTEN_S1_MAX = 1416
NFCB_TLISTEN_S2_MIN = 248
NFCB_TLISTEN_S2_MAX = 392
NFCB_FGT_DEF = NFCB_TR0_MIN
NFCB_FWT_DEF = 256 * 16 * (1 << 4)
NFCB_SFGT_DEF = 256 * 16 * (1 << 0)
NFCB_RGT_DEF = 7000
NFCB_FWT_ATQB = 7680
NFCB_SLOT_TABLE = (1, 2, 4, 8, 16, 0, 0, 0)
NFCB_TR0_MIN_TABLE = (0, 48 * 16, 16 * 16, 0)
NFCB_TR1_MIN_TABLE = (0, 64 * 16, 16 * 16, 0)

# --- NFC-F (Nfc.h:129-144) ---
NFCF_FGT_DEF = 1024
NFCF_FWT_DEF = 256 * 16 * (1 << 4)
NFCF_SFGT_DEF = 4096
NFCF_RGT_DEF = 7000
NFCF_FDT_ATQC = 512 * 64
NFCF_TSU_ATQC = 256 * 64

# --- NFC-V (Nfc.h:151-169) ---
NFCV_TR0_MIN = 1024
NFCV_FGT_DEF = NFCV_TR0_MIN
NFCV_TLISTEN_S1 = 768
NFCV_TLISTEN_S2 = 256
NFCV_FWT_DEF = 256 * 16 * (1 << 4)
NFCV_SFGT_DEF = 4096
NFCV_RGT_DEF = 7000

# --- command codes (per tech headers; used by protocol layers) ---
# NFC-A commands (tech/NfcA.h region of the reference)
NFCA_REQA = 0x26
NFCA_WUPA = 0x52
NFCA_SEL1 = 0x93
NFCA_SEL2 = 0x95
NFCA_SEL3 = 0x97
NFCA_HLTA = 0x50
NFCA_RATS = 0xE0
NFCA_PPS = 0xD0
NFCA_AUTH1 = 0x60
NFCA_AUTH2 = 0x61
NFCA_IBLOCK = 0x02
NFCA_RBLOCK = 0xA2
NFCA_SBLOCK = 0xC0

# NFC-B commands (tech/NfcB.h:43-44)
NFCB_REQB = 0x05
NFCB_ATTRIB = 0x1D

# NFC-F commands (tech/NfcF.h:43)
NFCF_REQC = 0x00
