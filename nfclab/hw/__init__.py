from .signal import SignalBuffer, SignalType
from .device import Device, SignalDevice, DeviceFactory
from .record import RecordDevice
