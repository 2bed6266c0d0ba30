"""Live SDR capture devices over the native bridge.

``NativeSdrDevice`` wraps the C-ABI driver table in
``native/src/sdr_bridge.cpp`` (enumerate / open / set-param /
start(callback) / stop — the surface of ``hw::radio::RadioDevice``,
RadioDevice.h:33-78) as a ``SignalDevice``: the native reader thread pushes
float blocks through a ctypes callback into a bounded queue that ``read``
drains.

Drivers: ``loopback`` (synthetic CI stand-in), ``rtltcp`` (rtl_tcp network
client — 8-bit IQ over TCP, the standard remote RTL-SDR transport) and
``spyserver`` (Airspy SpyServer protocol client — u8/i16/f32 IQ over TCP,
the standard remote transport for the AirSpy family the reference drives
locally over USB, AirspyDevice.cpp:42-309).  libusb vendor drivers slot
into the same table when their libraries are present.
"""

from __future__ import annotations

import ctypes
import queue

import numpy as np

from .device import DeviceFactory, SignalDevice

_STREAM_CB = ctypes.CFUNCTYPE(
    None,
    ctypes.POINTER(ctypes.c_float),
    ctypes.c_int64,
    ctypes.c_int64,
    ctypes.c_void_p,
)


def _lib():
    from ..native.binding import _load

    lib = _load()
    if lib is None:
        return None
    if not getattr(lib, "_sdr_bound", False):
        c = ctypes
        lib.nfclab_sdr_open.argtypes = [c.c_char_p]
        lib.nfclab_sdr_open.restype = c.c_void_p
        lib.nfclab_sdr_set_param.argtypes = [
            c.c_char_p, c.c_void_p, c.c_int, c.c_double,
        ]
        lib.nfclab_sdr_set_param.restype = c.c_int
        lib.nfclab_sdr_get_param.argtypes = [c.c_char_p, c.c_void_p, c.c_int]
        lib.nfclab_sdr_get_param.restype = c.c_double
        lib.nfclab_sdr_start.argtypes = [
            c.c_char_p, c.c_void_p, _STREAM_CB, c.c_void_p,
        ]
        lib.nfclab_sdr_start.restype = c.c_int
        lib.nfclab_sdr_stop.argtypes = [c.c_char_p, c.c_void_p]
        lib.nfclab_sdr_stop.restype = c.c_int
        lib.nfclab_sdr_close.argtypes = [c.c_char_p, c.c_void_p]
        lib.nfclab_sdr_close.restype = None
        lib._sdr_bound = True
    return lib


# capture schemes that publish logic probe samples (ISO7816 path) rather
# than radio IQ/magnitude — used by the apps to route to the logic decoder,
# and by the device queue policy: logic decode cannot tolerate sample gaps,
# so logic streams buffer losslessly (the reference's unbounded
# rt::BlockingQueue semantics) while lossy radio streams drop-on-full.
LOGIC_SCHEMES = ("logicloop", "logictcp", "dslogic", "sipeed")


class NativeSdrDevice(SignalDevice):
    """A capture device backed by a native bridge driver.

    ident examples: ``loopback://test``, ``rtltcp://127.0.0.1:1234``.
    """

    def __init__(self, ident: str, queue_blocks: int = 64):
        super().__init__(ident)
        self.ident = ident
        self._handle = None
        # logic capture must be gap-free: unbounded queue (reference
        # parity: tasks buffer in an unbounded rt::BlockingQueue).  Radio
        # capture tolerates drops under backpressure, so it stays bounded.
        self._lossless = ident.split(":")[0] in LOGIC_SCHEMES
        self._queue: "queue.Queue[np.ndarray]" = queue.Queue(
            0 if self._lossless else queue_blocks
        )
        self._eof = False
        self._cb = _STREAM_CB(self._on_block)
        self._streaming = False
        self._dropped = 0
        self._read_total = 0

    # -------------------------------------------------------------- lifecycle

    def open(self, mode: str = "read") -> bool:
        lib = _lib()
        if lib is None:
            return False
        self._handle = lib.nfclab_sdr_open(self.ident.encode())
        self._open = self._handle is not None
        return self._open

    def close(self):
        if self._handle is not None:
            lib = _lib()
            if self._streaming:
                self.stop()
            lib.nfclab_sdr_close(self.ident.encode(), self._handle)
            self._handle = None
        self._open = False

    # ----------------------------------------------------------------- params

    def set(self, param: int, value) -> bool:
        lib = _lib()
        if lib is None or self._handle is None:
            return False
        ok = lib.nfclab_sdr_set_param(
            self.ident.encode(), self._handle, int(param), float(value)
        )
        if ok == 0:
            self._params[param] = value
        return ok == 0

    def get(self, param: int, default=None):
        lib = _lib()
        if lib is None or self._handle is None:
            return default
        v = lib.nfclab_sdr_get_param(
            self.ident.encode(), self._handle, int(param)
        )
        return default if v == -1 else v

    # -------------------------------------------------------------- streaming

    def _on_block(self, samples, count, offset, user):
        if count == 0:
            # driver EOF marker (e.g. rtl_tcp server closed the connection):
            # out-of-band flag so no queued data block is ever evicted —
            # read() reports EOF once the queue drains
            self._eof = True
            return
        block = np.ctypeslib.as_array(samples, shape=(count,)).copy()
        try:
            self._queue.put_nowait(block)  # lossless queues never raise Full
        except queue.Full:
            self._dropped += count

    def start(self) -> bool:
        lib = _lib()
        if lib is None or self._handle is None or self._streaming:
            return False
        ok = lib.nfclab_sdr_start(
            self.ident.encode(), self._handle, self._cb, None
        )
        self._streaming = ok == 0
        return self._streaming

    def stop(self) -> bool:
        lib = _lib()
        if lib is None or self._handle is None or not self._streaming:
            return False
        ok = lib.nfclab_sdr_stop(self.ident.encode(), self._handle)
        self._streaming = False
        return ok == 0

    def read(self, count: int = 0, timeout: float = 1.0):
        """Next captured block (float32; rtltcp delivers interleaved IQ).
        None on timeout; a zero-length block marks driver EOF (reported
        only after every queued data block has been drained)."""
        if self._eof:
            try:
                block = self._queue.get_nowait()
            except queue.Empty:
                return np.empty(0, np.float32)
        else:
            try:
                block = self._queue.get(timeout=timeout)
            except queue.Empty:
                # EOF may have raced in while we waited
                if self._eof and self._queue.empty():
                    return np.empty(0, np.float32)
                return None
        self._read_total += len(block)
        return block

    @property
    def samples_read(self) -> int:
        return self._read_total

    @property
    def samples_lost(self) -> int:
        return self._dropped

    def is_eof(self) -> bool:
        return False


def _enumerate_loopback():
    from ..native.binding import sdr_drivers

    return ["loopback://test"] if "loopback" in sdr_drivers() else []


DeviceFactory.register_device(
    "loopback", _enumerate_loopback, lambda ident: NativeSdrDevice(ident)
)
# network devices: nothing to scan locally; opened explicitly by ident
DeviceFactory.register_device(
    "rtltcp", lambda: [], lambda ident: NativeSdrDevice(ident)
)
DeviceFactory.register_device(
    "spyserver", lambda: [], lambda ident: NativeSdrDevice(ident)
)


def _enumerate_logicloop():
    from ..native.binding import sdr_drivers

    return ["logicloop://test"] if "logicloop" in sdr_drivers() else []


# logic-analyzer capture (stream-mode network transport + CI loopback; the
# LogicDevice slot of the reference's DSLogic/Sipeed drivers)
DeviceFactory.register_device(
    "logicloop", _enumerate_logicloop, lambda ident: NativeSdrDevice(ident)
)
DeviceFactory.register_device(
    "logictcp", lambda: [], lambda ident: NativeSdrDevice(ident)
)


def _enumerate_usb(scheme: str):
    def scan():
        from ..native.binding import sdr_enumerate

        return sdr_enumerate(scheme)

    return scan


# dlopen'd vendor USB drivers (usb_drivers.cpp / usb_logic.cpp): enumerate
# scans the real USB bus when the vendor library + hardware are present
for _scheme in ("airspy", "hydrasdr", "rtlsdr", "mirisdr",  # radio
                "dslogic", "sipeed"):                       # logic analyzers
    DeviceFactory.register_device(
        _scheme, _enumerate_usb(_scheme), lambda ident: NativeSdrDevice(ident)
    )

