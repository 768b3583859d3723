"""Test config: force an 8-virtual-device CPU mesh so sharding/collective
logic is exercised without TPU hardware (the JAX equivalent of a fake
distributed backend — see SURVEY.md §4 item 6)."""
import os

# NOTE: the sandbox's axon TPU plugin hijacks JAX_PLATFORMS — the legacy
# JAX_PLATFORM_NAME is honored and also ~10x faster to compile (no remote
# tunnel round-trips), so set both.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env vars above are not always enough: the sandbox's sitecustomize
# (PYTHONPATH=/root/.axon_site) imports jax at interpreter startup —
# BEFORE this conftest — so jax's platform config may have captured
# 'axon' already. jax.config.update works as long as no backend has
# initialized yet, and forces the suite onto the 8-virtual-device CPU
# mesh (fast local compiles, no TPU-tunnel round trips).
jax.config.update("jax_platforms", "cpu")

# Persistently cache EVERY compile (the suite is compile-bound on a
# 1-core sandbox): a re-run of the suite skips nearly all XLA work.
# A pre-warmed cache snapshot ships in-repo (.jax_cache/, ~27 MB) so even
# the FIRST run on a fresh sandbox skips most compiles — seed the working
# cache from it (keys include jax version/backend/flags, so a mismatched
# environment just recompiles; nothing can break).
_snapshot = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
_cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
if os.environ.get("COOKIETTS_NO_CACHE_SEED"):   # escape hatch
    _snapshot = ""
if os.path.isdir(_snapshot):
    import shutil
    os.makedirs(_cache_dir, exist_ok=True)
    have = set(os.listdir(_cache_dir))
    for name in os.listdir(_snapshot):
        if name not in have:
            try:
                shutil.copy(os.path.join(_snapshot, name), _cache_dir)
            except OSError:
                break
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# Tests measure correctness, not speed: most of the suite's wall time is
# XLA compilation on the single sandbox core, so turn the optimizer off
# (numerics are unchanged; every parity test still runs the same ops).
# COOKIETTS_DISABLE_OPTS=0 opts back into full XLA optimization.
if os.environ.get("COOKIETTS_DISABLE_OPTS", "1") != "0":
    jax.config.update("jax_disable_most_optimizations", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
