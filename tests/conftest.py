import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. Must be set before jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# this image's sitecustomize force-registers the axon TPU backend; pin the
# test platform to the virtual CPU mesh regardless
jax.config.update("jax_platforms", "cpu")

# Persistent compiled-executable cache across test sessions: the suite's cost
# is dominated by re-jitting the full env step per EnvConfig shape; caching
# makes repeat runs of an unchanged tree fast (regression net must be cheap
# to run — see VERDICT r3 item 9).
os.makedirs("/root/.cache/jaxcomp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def simple_map_dir():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "data", "simple_map")
