"""Multi-host launch: distributed initialization + global mesh layout.

SURVEY §2.10's distributed story for this domain: decode work is
embarrassingly parallel at the capture level (file-level data sharding
across hosts) and halo-coupled at the block level (one H-sample ppermute
per device per step).  This module provides the launch-side pieces:

- ``initialize``: `jax.distributed.initialize` wrapper — run the SAME
  program on every host; single-process runs are a no-op so all code paths
  work unchanged on one machine.
- ``global_mesh``: a 1-D ``blocks`` mesh over every process's devices,
  ordered host-major so consecutive overlap-save blocks land on the same
  host — the ring ppermute's halo then rides ICI within each host and
  crosses DCN only once per host boundary per step (the layout rule from
  the scaling-book recipe: lay shardings so collectives ride ICI, not DCN).
- ``host_local_paths``: partition a capture list across processes for the
  file-level throughput configuration (each host decodes its own subset
  with `runtime.batch.decode_batch`; no cross-host communication at all).

`shard.multichip.sharded_capture_channels` / `sharded_kernel_channels`
accept the mesh's device list directly, so the production channel step runs
unchanged on a multi-host mesh.
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> int:
    """Initialize JAX's distributed runtime; returns this process's index.

    No-op (returns 0) when no coordinator is given and the environment
    carries no cluster configuration — the single-host case."""
    import jax

    if coordinator_address is None and num_processes is None:
        return jax.process_index() if jax.process_count() > 1 else 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def global_devices_host_major(devices=None) -> list:
    """All devices ordered (process, device) so a 1-D blocks axis keeps
    consecutive blocks on one host (halo ppermute crosses DCN only at host
    boundaries)."""
    import jax

    devs = list(devices) if devices is not None else jax.devices()
    return sorted(devs, key=lambda d: (d.process_index, d.id))


def global_mesh(devices=None):
    """1-D ``blocks`` mesh over every process's devices, host-major."""
    from jax.sharding import Mesh

    devs = global_devices_host_major(devices)
    return Mesh(np.array(devs), ("blocks",))


def host_local_paths(paths: list[str], process_id: int | None = None,
                     num_processes: int | None = None) -> list[str]:
    """This host's share of a capture list (round-robin, so heterogeneous
    file sizes spread evenly) — the file-level data sharding of the
    multi-host throughput configuration."""
    import jax

    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return [p for i, p in enumerate(paths) if i % n == pid]
