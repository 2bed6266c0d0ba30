"""Mesh + temporal sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from tests.conftest import ensure_cpu_devices


@pytest.fixture(scope="module")
def cpu_mesh():
    ensure_cpu_devices()
    import jax

    devices = jax.devices("cpu")
    if len(devices) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    from nfclab.shard.mesh import make_mesh

    return make_mesh(stream_parallel=4, time_parallel=2, devices=devices[:8])


def test_overlap_save_roundtrip():
    from nfclab.shard.temporal import overlap_save_blocks, stitch_blocks

    x = np.arange(100000, dtype=np.float32)
    blocks, starts, scan_starts = overlap_save_blocks(x, block=16384, halo=4096)
    out = stitch_blocks(blocks, starts, scan_starts, len(x))
    np.testing.assert_array_equal(out, x)


def test_sharded_frontend_step(cpu_mesh):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nfclab.shard.temporal import sharded_frontend_step

    step = sharded_frontend_step(cpu_mesh, 10_000_000)
    rng = np.random.default_rng(0)
    blocks = (rng.random((8, 4, 2048), dtype=np.float32) * 0.4).astype(np.float32)
    arr = jax.device_put(blocks, NamedSharding(cpu_mesh, P("stream", "time", None)))
    out = step(arr)
    assert out["envelope"].shape == (8, 4, 2048)
    # sharding is preserved on outputs
    assert out["envelope"].sharding.spec == P("stream", "time", None)


def test_halo_exchange_ring(cpu_mesh):
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from nfclab.shard.temporal import halo_exchange

    halo = 4
    data = np.arange(16, dtype=np.float32).reshape(2, 8)  # [time shards x local]

    def fn(x):  # x: [1, 8] per device slice along time
        return halo_exchange(x, halo, "time")

    with cpu_mesh:
        out = shard_map(
            fn,
            mesh=cpu_mesh,
            in_specs=P(None, "time"),
            out_specs=P(None, "time"),
        )(jnp.asarray(data.reshape(1, 16)))
    out = np.asarray(out).reshape(2, halo)
    # device 1 receives device 0's tail, device 0 receives device 1's (ring)
    np.testing.assert_array_equal(out[1], data[0, -halo:])
    np.testing.assert_array_equal(out[0], data[1, -halo:])


def test_multihost_launch_helpers(fixture_dir):
    """Multi-host launch pieces on the single-process virtual mesh:
    host-major device ordering, the global blocks mesh feeding the
    production sharded step unchanged, and file-level path partitioning."""
    from conftest import ensure_cpu_devices

    ensure_cpu_devices()
    import jax

    from nfclab.shard.launch import (
        global_devices_host_major,
        global_mesh,
        host_local_paths,
        initialize,
    )

    assert initialize() == 0  # single-process no-op

    devs = global_devices_host_major(jax.devices("cpu"))
    assert [(d.process_index, d.id) for d in devs] == sorted(
        (d.process_index, d.id) for d in jax.devices("cpu")
    )
    mesh = global_mesh(jax.devices("cpu")[:4])
    assert mesh.axis_names == ("blocks",)
    assert mesh.devices.shape == (4,)

    # the production sharded channel step accepts the mesh's devices
    from nfclab.io.wav import read_wav
    from nfclab.runtime.decoder import NfcDecoder
    from nfclab.shard.multichip import decode_sharded

    samples, info = read_wav(
        str(fixture_dir / "test_NFC-A_106kbps_002.wav")
    )
    frames = decode_sharded(
        samples, info.sample_rate, devices=list(mesh.devices.reshape(-1))
    )
    assert frames == NfcDecoder().decode(samples, info.sample_rate)

    # round-robin file sharding covers every path exactly once
    paths = [f"c{i}.wav" for i in range(7)]
    parts = [host_local_paths(paths, pid, 3) for pid in range(3)]
    assert sorted(sum(parts, [])) == sorted(paths)
    assert max(len(p) for p in parts) - min(len(p) for p in parts) <= 1
