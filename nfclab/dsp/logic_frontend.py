"""Device-side logic-analyzer frontend: per-channel edges + packed event mask.

TPU-native analog of the reference's per-sample logic kernel
(IsoTech.cpp:31-71, edge = value - last per channel): the ISO7816 walker
(demod/iso7816.py) only ever visits sparse events — IO edges, RST/VCC line
edges, CLK falling edges — so the device packs those trigger bits into one
small integer per sample.  The host then derives each event index set with
a single ``flatnonzero`` over fetched small ints instead of four dense
comparisons over the f32 channel arrays, mirroring how the radio path
derives its detect indices from the fused kernel's ``detect_mask``
(dsp/pallas/fused_frontend.py).

Mask bits (exact small integers):
  1  IO edge     (edge[CH_IO]  != 0)   -> Iso7816 ``io_edges``
  2  IO fall     (edge[CH_IO]  <  0)   -> ``io_falls``
  4  line edge   (edge[CH_RST] != 0 or edge[CH_VCC] != 0) -> ``line_edges``
  8  CLK fall    (edge[CH_CLK] <  0)   -> ``clk_falls``

Edge math is a single f32 subtract — bit-identical between device and host
(no reduction/reassociation), so the derived index sets equal the host
scans exactly.

Chunked streaming: the carry is the previous chunk's final sample per
channel; passing ``carry=None`` (stream start) yields edge 0 at t=0,
matching the reference's warm-up (IsoTech.cpp:31-41 keeps sampleData zeroed
until the first sample) and the host decoder's ``edge[0] = 0``.
"""

from __future__ import annotations

import functools

import numpy as np

from ..demod.iso7816 import CH_CLK, CH_IO, CH_RST, CH_VCC

MASK_IO_EDGE = 1
MASK_IO_FALL = 2
MASK_LINE_EDGE = 4
MASK_CLK_FALL = 8

# mask bit -> StreamingIsoDecoder index-set name
MASK_LAYOUT = (
    ("io_edges", MASK_IO_EDGE),
    ("io_falls", MASK_IO_FALL),
    ("line_edges", MASK_LINE_EDGE),
    ("clk_falls", MASK_CLK_FALL),
)


@functools.lru_cache(maxsize=1)
def _jitted():
    import jax
    import jax.numpy as jnp

    def run(block, carry):
        # block [..., T, C]; carry [..., 1, C] = previous chunk's last sample
        prev = jnp.concatenate([carry, block[..., :-1, :]], axis=-2)
        edge = block - prev
        mask = jnp.zeros(block.shape[:-1], jnp.int32)
        mask += jnp.where(edge[..., CH_IO] != 0, MASK_IO_EDGE, 0)
        mask += jnp.where(edge[..., CH_IO] < 0, MASK_IO_FALL, 0)
        line = (edge[..., CH_RST] != 0) | (edge[..., CH_VCC] != 0)
        mask += jnp.where(line, MASK_LINE_EDGE, 0)
        mask += jnp.where(edge[..., CH_CLK] < 0, MASK_CLK_FALL, 0)
        # bits fit in 4 -> ship uint8: 1 byte/sample over the link
        return mask.astype(jnp.uint8), block[..., -1:, :]

    return jax.jit(run)


def logic_event_mask(block: np.ndarray, carry=None):
    """Compute the packed per-sample event mask for one logic chunk.

    block: [T, C] or [B, T, C] f32 logic samples (C >= 4, IO/CLK/RST/VCC
    layout per demod/iso7816.CH_*).  carry: the value returned by the
    previous call for this stream, or None at stream start.

    Returns (mask, carry): mask is uint8 [T] / [B, T] on the device (the
    four event bits fit in a byte — the fetch moves 1 byte/sample); carry
    feeds the next chunk.  Fetch with np.asarray(mask).
    """
    import jax.numpy as jnp

    block = jnp.asarray(block, jnp.float32)
    if carry is None:
        carry = block[..., :1, :]
    return _jitted()(block, carry)


def event_indices(mask: np.ndarray, base: int = 0) -> dict[str, np.ndarray]:
    """Host-side unpack: mask [T] -> the four sorted event index sets the
    ISO7816 walker binds, offset by ``base`` (the chunk's absolute start)."""
    bits = np.asarray(mask)
    return {
        name: np.flatnonzero(bits & bit).astype(np.int64) + base
        for name, bit in MASK_LAYOUT
    }
