"""Fault-cost canary: repeated short windowed-decode sessions with
per-rep wall/user-CPU/minor-fault counts.

Round-5 finding this probe established: this VM class charges minor page
faults as USER time at ~210 us each (rate inversely tracks fault count
with wall == cpu), so short sessions are fault-dominated in every metric
and honest benchmarks must report steady-state segment rates over LONG
sessions (see CLAUDE.md environment notes and streaming_bench).
"""
import sys, time, resource
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
def main():
    from nfclab.core.malloc_tune import malloc_tune
    malloc_tune()
    from nfclab.tools.streaming_bench import _looped_capture
    from nfclab.runtime.streaming import StreamingNfcDecoder
    sig, rate = _looped_capture(2_000_000, 4)
    chunk = 65536
    for rep in range(10):
        dec = StreamingNfcDecoder(rate, window=1<<21)
        t0=time.perf_counter(); u0=resource.getrusage(resource.RUSAGE_SELF)
        n=0
        for off in range(0, len(sig)-chunk, chunk):
            dec.feed(sig[off:off+chunk]); n+=chunk
        dec.finish()
        u1=resource.getrusage(resource.RUSAGE_SELF)
        dt=time.perf_counter()-t0
        cpu=(u1.ru_utime+u1.ru_stime)-(u0.ru_utime+u0.ru_stime)
        print(f"rep{rep}: {n/dt/1e6:5.1f} MS/s wall  {n/cpu/1e6:5.1f} MS/s cpu  flt={u1.ru_minflt-u0.ru_minflt}")
        time.sleep(1)
if __name__ == "__main__":
    main()
