"""Manual check: serve the live monitor on a fixed port with real decoded
frames + wave data (mock rtl_tcp source), for driving with a browser."""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

from test_sdr_bridge import MockRtlTcpServer

from nfclab.apps.monitor import MonitorServer
from nfclab.hw.device import PARAM_SAMPLE_RATE
from nfclab.io.wav import read_wav
from nfclab.runtime.pipeline import (
    Executor, FourierTask, LiveRadioSourceTask, RadioDecoderTask,
    ResamplingTask,
)
from nfclab.runtime.subject import Subject

Subject.clear_registry()
samples, info = read_wav(
    "/root/reference/wav/test_NFC-A_106kbps_001.wav"
)
samples = np.tile(samples, 3)
n = len(samples)
iq = np.empty(2 * n, np.uint8)
iq[0::2] = np.clip(np.round(samples * 127.5 + 127.5), 0, 255).astype(
    np.uint8
)
iq[1::2] = 128
server = MockRtlTcpServer(payload=iq, min_commands=1)

monitor = MonitorServer(port=8765).start()
source = LiveRadioSourceTask(
    f"rtltcp://127.0.0.1:{server.port}", {PARAM_SAMPLE_RATE: info.sample_rate}
)
ex = Executor(pool_size=4)
ex.submit(RadioDecoderTask())
ex.submit(FourierTask())
ex.submit(ResamplingTask())
ex.submit(source)
print(f"monitor on http://127.0.0.1:{monitor.port}", flush=True)
time.sleep(600)
