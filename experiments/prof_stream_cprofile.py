"""cProfile the streaming feed path (user-CPU hot spots)."""
import cProfile
import pstats
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from nfclab.io.wav import read_wav
from nfclab.runtime.streaming import StreamingNfcDecoder

data, info = read_wav("/root/reference/wav/test_NFC-A_106kbps_001.wav")
rate = info.sample_rate
mag = data[:, 0] if data.ndim == 2 else data
big = np.tile(mag, max(1, 20_000_000 // len(mag)))

blk = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
dec = StreamingNfcDecoder(rate, window=1 << 21)


def run():
    for i in range(0, len(big) - blk + 1, blk):
        dec.feed(big[i : i + blk])


cProfile.run("run()", "/tmp/stream.prof")
p = pstats.Stats("/tmp/stream.prof")
p.sort_stats("cumulative").print_stats(25)
