"""Test harness config: force an 8-device CPU mesh.

The container's sitecustomize registers the axon TPU PJRT plugin in every
python process (gated on PALLAS_AXON_POOL_IPS), and remote compiles through
the tunnel take minutes — unusable for a test suite.  Tests therefore run on
the CPU backend with 8 virtual devices (the multi-chip simulation the
reference lacks entirely; SURVEY.md §4).  Since the plugin is initialized
before pytest imports us, we re-exec once with a scrubbed environment.

The re-exec happens in pytest_configure (not at import time) so we can
suspend pytest's fd-level capture first — otherwise the child inherits the
captured temp-file fds and its output is lost.
"""

import os
import sys


def _needs_reexec() -> bool:
    if os.environ.get("VISINGER_TPU_TESTS_REEXECED"):
        return False
    # If the axon plugin was enabled at interpreter start, jax is already
    # bound to the TPU tunnel; env tweaks now are too late.
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["VISINGER_TPU_TESTS_REEXECED"] = "1"
    xla_flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in xla_flags:
        env["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execvpe(sys.executable,
               [sys.executable, "-u", "-m", "pytest", *sys.argv[1:]], env)


if not _needs_reexec():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    # Persistent compilation cache: XLA-CPU compiles of the fused train step
    # take tens of seconds; cache them across test runs.
    _CACHE_DIR = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tests")
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}"
    )
