"""Profile StreamingNfcDecoder.feed() fixed costs vs block size."""
import resource
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from nfclab.io.wav import read_wav
from nfclab.runtime.streaming import StreamingNfcDecoder

path = "/root/reference/wav/test_NFC-A_106kbps_001.wav"
data, info = read_wav(path)
rate = info.sample_rate
mag = data[:, 0] if data.ndim == 2 else data
print(f"{len(mag)} samples @ {rate}")

# tile it to ~40M samples for a stable measurement
reps = max(1, 40_000_000 // len(mag))
big = np.tile(mag, reps)
print(f"stream: {len(big)/1e6:.1f} MS")

for blk in (16384, 65536, 262144, 1048576):
    dec = StreamingNfcDecoder(rate, window=1 << 21)
    t0 = time.perf_counter()
    u0 = resource.getrusage(resource.RUSAGE_SELF).ru_utime
    nf = 0
    for i in range(0, len(big) - blk + 1, blk):
        nf += len(dec.feed(big[i : i + blk]))
    dt = time.perf_counter() - t0
    du = resource.getrusage(resource.RUSAGE_SELF).ru_utime - u0
    n = (len(big) // blk) * blk
    print(
        f"blk={blk:>8} wall={dt:6.2f}s user={du:6.2f}s "
        f"-> {n/dt/1e6:6.2f} MS/s wall, {n/du/1e6:6.2f} MS/s user, frames={nf}"
    )
