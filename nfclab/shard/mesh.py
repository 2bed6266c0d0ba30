"""Device mesh helpers.

The reference's concurrency is a 10-thread pool over pub/sub queues
(SURVEY.md §2.10); the TPU-native replacement is a `jax.sharding.Mesh` with
two axes:

- ``stream``: data parallelism over independent captures/streams (replaces
  the thread pool for throughput)
- ``time``: temporal sharding of one long stream into overlap-save blocks
  (the "sequence parallelism" of this domain; halos make blocks independent,
  so no collectives are needed in steady state — `ppermute` halo exchange is
  only used by the streaming path where blocks arrive incrementally)
"""

from __future__ import annotations

import numpy as np


def make_mesh(stream_parallel: int | None = None, time_parallel: int = 1, devices=None):
    """Create a (stream, time) mesh over available devices."""
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if stream_parallel is None:
        stream_parallel = n // time_parallel
    assert stream_parallel * time_parallel == n, (
        f"{stream_parallel}x{time_parallel} != {n} devices"
    )
    return Mesh(devices.reshape(stream_parallel, time_parallel), ("stream", "time"))


def shard_batch(mesh, arr, axis_name: str = "stream"):
    """Place a [B, ...] array sharded over the given mesh axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * arr.ndim
    spec[0] = axis_name
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))
