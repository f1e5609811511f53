"""Test configuration: force CPU JAX with a virtual 8-device mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os
import sys

# The axon TPU plugin (on PYTHONPATH via /root/.axon_site) initializes even
# under JAX_PLATFORMS=cpu and intermittently stalls CPU-only runs for
# minutes on its tunnel. Tests are CPU-only: drop it before jax imports.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if p and ".axon_site" not in p)

os.environ["JAX_PLATFORMS"] = "cpu"   # force: the ambient env says 'axon'
os.environ["LIDIFF_MATMUL_PRECISION"] = "highest"   # exact f32 vs numpy
# rolled conv tap loops: same math, ~9-27x smaller HLO. These tests run on
# a 1-core CPU host where XLA compile time dominates the suite wall clock.
# (test_sparse_conv exercises the unrolled path explicitly.)
os.environ.setdefault("LIDIFF_CONV_SCAN", "1")

# The axon sitecustomize (loaded via PYTHONPATH before this conftest) calls
# jax.config.update("jax_platforms", "axon,cpu"), which outranks the env
# var. Override it back before any backend is initialized: tests must run
# on local CPU, not through the TPU tunnel.
try:
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

_cache_dir = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))


def _late_cache_config():
    # jax may have been imported by sitecustomize before our env vars were
    # set; apply cache settings through the config API as well
    import jax
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_late_cache_config()
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compilation cache: compiles are the dominant cost of this suite
# on a 1-core host, and the graphs are identical between runs
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
