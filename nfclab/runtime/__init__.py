from .decoder import NfcDecoder
