from .crc import (
    crc16_ccitt,
    check_crc_nfca,
    check_crc_nfcb,
    check_crc_nfcf,
    check_crc_nfcv,
)
