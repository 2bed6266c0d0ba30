"""nfclab — a TPU-native NFC/ISO7816 signal decoding framework.

A from-scratch reimplementation of the capabilities of josevcm/nfc-laboratory
(SDR NFC sniffer / protocol decoder + ISO7816 logic analyzer), redesigned for
TPU hardware:

- Dense per-sample DSP (signal conditioning, symbol correlators, BPSK phase
  integrators, PPM slot sums) runs as batched JAX/Pallas array programs on TPU.
- The thin protocol state machines (symbol walk, framing, CRC/parity, ISO-DEP
  sequencing) run on host over sparse *events* extracted from the dense arrays.
- Long streams are decoded block-parallel (overlap-save with warm-up halos);
  independent captures/streams shard across a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md §7.0):
    core/      data model: Frame (= lab::RawFrame), constants, bitrate params
    io/        WAV + TRZ + golden-JSON storage (= hw::RecordDevice, rt::Package)
    dsp/       JAX/Pallas kernels: conditioning scans, box correlators, FFT
    demod/     per-tech demodulator state machines (NFC-A/B/F/V)
    protocol/  CRC, ISO7816, protocol detail parsers
    shard/     temporal tiling + mesh sharding
    runtime/   decoder facade, streaming pipeline, tasks, metrics
    native/    C++ oracle kernels + hot-loop runtime (ctypes-bound)
    apps/      CLI entry points (decode, bench)
"""

__version__ = "0.1.0"
