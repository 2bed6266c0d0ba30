"""Device abstraction and factory registry.

Parity with ``hw::Device`` / ``hw::SignalDevice`` / ``hw::DeviceFactory``
(hw-dev/.../hw/Device.h:31-85, SignalDevice.h:30-57,
cpp/hw/DeviceFactory.cpp:35-62): typed get/set by parameter id, open/close,
buffer read/write, and a global type-string -> (enumerator, constructor)
registry with filtered enumeration (the hotplug scan surface).
"""

from __future__ import annotations

import fnmatch
from typing import Any, Callable

# generic device params (Device.h param ids 0-99)
PARAM_DEVICE_NAME = 0
PARAM_DEVICE_SERIAL = 1
PARAM_DEVICE_VERSION = 2

# signal device params (SignalDevice.h ids 100-123)
PARAM_SAMPLE_RATE = 100
PARAM_SAMPLE_SIZE = 101
PARAM_SAMPLE_TYPE = 102
PARAM_SAMPLE_OFFSET = 103
PARAM_STREAM_TIME = 110
PARAM_SAMPLES_READ = 111
PARAM_SAMPLES_LOST = 112
PARAM_CHANNEL_COUNT = 120
PARAM_CHANNEL_KEYS = 121

# radio device params (radio/RadioDevice.h ids 1001-1010)
PARAM_TUNE_FREQUENCY = 1001
PARAM_GAIN_MODE = 1002
PARAM_GAIN_VALUE = 1003
PARAM_MIXER_AGC = 1004
PARAM_TUNER_AGC = 1005
PARAM_BIAS_TEE = 1006
PARAM_DIRECT_SAMPLING = 1007
PARAM_DECIMATION = 1008

# logic device params (logic/LogicDevice.h ids 1001-1201)
PARAM_CLOCK_FREQUENCY = 1101
PARAM_RLE_COMPRESSION = 1102
PARAM_PROBES = 1103
PARAM_VOLTAGE_THRESHOLD = 1104
PARAM_OPERATION_MODE = 1105
PARAM_FIRMWARE_PATH = 1106


class Device:
    """open/close + typed get/set by int param id (Device.h:31-85)."""

    def __init__(self, name: str):
        self._name = name
        self._params: dict[int, Any] = {PARAM_DEVICE_NAME: name}
        self._open = False

    def open(self, mode: str = "read") -> bool:
        self._open = True
        return True

    def close(self):
        self._open = False

    @property
    def is_open(self) -> bool:
        return self._open

    def get(self, param: int, default=None):
        return self._params.get(param, default)

    def set(self, param: int, value) -> bool:
        self._params[param] = value
        return True


class SignalDevice(Device):
    """Adds streaming sample semantics (SignalDevice.h:30-57)."""

    def read(self, count: int):
        raise NotImplementedError

    def write(self, buffer) -> int:
        raise NotImplementedError

    def is_eof(self) -> bool:
        return False


class DeviceFactory:
    """Global registry: type string -> (enumerator, constructor)
    (DeviceFactory.cpp:35-62)."""

    _registry: dict[str, tuple[Callable[[], list[str]], Callable[[str], Device]]] = {}

    @classmethod
    def register_device(
        cls,
        type_name: str,
        enumerator: Callable[[], list[str]],
        constructor: Callable[[str], Device],
    ):
        cls._registry[type_name] = (enumerator, constructor)

    @classmethod
    def enumerate(cls, pattern: str = "*") -> list[str]:
        """List device identifiers ("type://serial") matching the glob."""
        out = []
        for type_name, (enumerator, _ctor) in cls._registry.items():
            if not fnmatch.fnmatch(type_name, pattern):
                continue
            for ident in enumerator():
                out.append(ident)
        return out

    @classmethod
    def new_instance(cls, ident: str) -> Device | None:
        type_name = ident.split("://")[0]
        entry = cls._registry.get(type_name)
        if entry is None:
            return None
        return entry[1](ident)
