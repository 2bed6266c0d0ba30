"""Temporal (sequence) sharding: overlap-save block decomposition.

A long sample stream is split along time into blocks with a left warm-up halo
sized for the conditioning chain's state memory plus the longest correlator
window (SURVEY.md §5 "long-context").  Blocks are laid out on the mesh as a
[stream, time_blocks, span] array sharded over both mesh axes; each device
processes its blocks independently through the dense frontend, and kept
regions are stitched on the host (or consumed shard-local by the event walk).

For the *streaming* case (blocks arriving over time on different devices),
`halo_exchange` passes each block's tail to its right neighbor over ICI with
`jax.lax.ppermute` — the classic ring halo pattern.
"""

from __future__ import annotations

import numpy as np

# default halo: covers the IIR (~270), mean EMA (~6k) and envelope carrier-on
# memory (~600 updates) plus the longest correlator window + symbol delay;
# see dsp.conditioner for the exactness story (boundary repair)
DEFAULT_HALO = 16384


def overlap_save_blocks(x: np.ndarray, block: int, halo: int = DEFAULT_HALO):
    """Split [T] -> [nb, halo+block] with left halos (edge-padded)."""
    n = len(x)
    nb = max(1, -(-n // block))
    padded = nb * block
    starts = np.arange(nb) * block
    scan_starts = np.maximum(starts - halo, 0)
    pad = np.pad(x, (0, padded + halo - n), mode="edge")
    idx = scan_starts[:, None] + np.arange(block + halo)[None, :]
    return pad[idx], starts, scan_starts


def stitch_blocks(blocks_out: np.ndarray, starts, scan_starts, n: int):
    """Concatenate kept regions [nb, span] -> [T]."""
    block = starts[1] - starts[0] if len(starts) > 1 else blocks_out.shape[1]
    out = np.empty(starts[-1] + block, blocks_out.dtype)
    for b, (s, ss) in enumerate(zip(starts, scan_starts)):
        drop = s - ss
        out[s : s + block] = blocks_out[b, drop : drop + block]
    return out[:n]


def halo_exchange(x_blocks, halo: int, axis_name: str = "time"):
    """Send each time-shard's tail to its right neighbor (ring ppermute).

    x_blocks: [local_T] per device along the `time` mesh axis (inside
    shard_map).  Returns the left halo received from the left neighbor.
    """
    import jax

    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    tail = x_blocks[..., -halo:]
    return jax.lax.ppermute(tail, axis_name, perm)


def sharded_frontend_step(mesh, sample_rate: int):
    """Build the mesh-sharded dense frontend step: value[B, NT, span] sharded
    (stream, time) -> frontend outputs with identical sharding.

    The frontend itself is elementwise/scan along the last (span) axis, so
    sharding the leading axes keeps every op local — XLA inserts no
    collectives in steady state, which is the design: halos were materialized
    into the span axis up front (overlap-save), trading `halo/block` FLOPs
    for zero ICI traffic on the hot path.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..dsp.frontend import jitted_frontend, make_frontend
    from ..core.params import SignalParams

    params = SignalParams(sample_rate)
    frontend = make_frontend(params)

    def step(blocks):  # [B, NT, span]
        b, nt, span = blocks.shape
        flat = blocks.reshape(b * nt, span)
        out = frontend(flat)
        return {k: v.reshape(b, nt, span) for k, v in out.items()}

    in_sharding = NamedSharding(mesh, P("stream", "time", None))
    out_sharding = NamedSharding(mesh, P("stream", "time", None))
    return jax.jit(step, in_shardings=in_sharding, out_shardings=out_sharding)
