import os
from pathlib import Path

import pytest

# force deterministic CPU execution for unit tests; the multi-chip sharding
# tests use a virtual 8-device CPU mesh.  The axon sitecustomize pins
# jax_platforms to the TPU plugin, so the env var alone is not enough — tests
# that use jax call ensure_cpu_devices() below before touching it.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# hermetic persistent-settings tier: live CLI runs inside the suite must
# never read or write the developer's real ~/.config/nfclab/settings.json
os.environ.setdefault(
    "NFCLAB_SETTINGS",
    f"/tmp/nfclab-test-settings-{os.getpid()}/settings.json",
)

_cpu_forced = False


def ensure_cpu_devices():
    global _cpu_forced
    if not _cpu_forced:
        import jax

        jax.config.update("jax_platforms", "cpu")
        _cpu_forced = True

FIXTURE_DIR = Path("/root/reference/wav")


@pytest.fixture(scope="session")
def fixture_dir() -> Path:
    if not FIXTURE_DIR.exists():
        pytest.skip("reference wav fixtures not available")
    return FIXTURE_DIR


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: validation that runs on the real TPU chip (deselect with "
        "-m 'not tpu' for the fast CPU-only tier; NFCLAB_SKIP_TPU_TESTS=1 "
        "also skips)",
    )
