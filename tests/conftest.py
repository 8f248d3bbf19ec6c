"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on a fake mesh per SURVEY.md §4(c);
the real-TPU path is exercised by bench.py and the driver's dryrun.

Note: a pytest plugin imports jax before this conftest runs, so env vars
(JAX_PLATFORMS / XLA_FLAGS) are already bound — we must go through
jax.config.update, which works until the backend is first used. The session
env pins JAX_PLATFORMS to the TPU tunnel; unit tests need the deterministic
fp32 CPU backend.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# XLA-CPU compiles are slow in this image (~3s per unique tiny op shape);
# a persistent cache makes repeat test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def pytest_configure(config):
    assert jax.default_backend() == "cpu", (
        "tests must run on the CPU backend; backend is "
        f"{jax.default_backend()}"
    )
    assert jax.device_count() == 8
