"""Test env: force 8 virtual CPU devices so multi-chip sharding paths compile
and execute without TPU hardware (SURVEY.md §4 item 6 — we test distributed
paths, unlike the reference).

The container's sitecustomize registers the TPU PJRT plugin at interpreter
start and pins ``jax_platforms``; overriding the config (not just the env var)
before first backend use reliably lands tests on the virtual CPU mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
try:  # persistent compile cache: repeated suite runs skip recompilation.
    # OUTSIDE the repo and keyed by the host-CPU fingerprint: the repo
    # travels between hosts across build rounds, and a CPU AOT executable
    # compiled for another machine's vector extensions segfaults when
    # loaded here (this killed two full-suite runs mid-flight before the
    # key existed — cli/common.py::machine_cache_tag).
    from tspo_tpu.cli.common import machine_cache_tag
    _cache = os.path.join(os.path.expanduser("~"), ".cache",
                          "tspo_tpu_xla_tests", machine_cache_tag())
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_live_executables_between_modules():
    """Full-suite runs (900+ tests, one process) have segfaulted three
    times deep inside XLA:CPU execution, each time past the ~1h mark with
    hundreds of live compiled executables accumulated — isolated reruns of
    the same tests always pass.  Dropping the in-memory executable caches
    at every module boundary bounds that accumulation; re-traces load from
    the persistent on-disk cache (fingerprinted per host CPU above), so
    the cost is milliseconds per program, not recompiles."""
    yield
    jax.clear_caches()
