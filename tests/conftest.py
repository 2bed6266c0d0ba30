import os
from pathlib import Path

import pytest

# force deterministic CPU execution for unit tests; the multi-chip sharding
# tests use a virtual 8-device CPU mesh (see shard tests)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

FIXTURE_DIR = Path("/root/reference/wav")


@pytest.fixture(scope="session")
def fixture_dir() -> Path:
    if not FIXTURE_DIR.exists():
        pytest.skip("reference wav fixtures not available")
    return FIXTURE_DIR
