"""Test session config.

Tier 0/2 strategy from SURVEY.md §5: run the suite on the CPU backend with
8 virtual devices (``--xla_force_host_platform_device_count=8``) so the
sharding tests are deterministic and cluster-free, and enable x64 so the
scipy/numpy oracle comparisons are exact-GP-math tight.

This environment force-registers a TPU-tunnel PJRT plugin in every Python
process via sitecustomize (gated on ``PALLAS_AXON_POOL_IPS``), which both
overrides ``JAX_PLATFORMS=cpu`` and serializes every process behind the
single tunneled chip.  sitecustomize runs before conftest, so the only
reliable way to get a clean CPU backend is to re-exec pytest with that
variable scrubbed.  The re-exec happens in ``pytest_configure`` (not at
import time) so pytest's fd-level capture can be suspended first —
otherwise the child's stdout lands in the orphaned capture temp file.

Set ``GP_TPU_TESTS=1`` to skip the re-exec and run the suite on whatever
backend the environment provides (e.g. the real TPU chip).
"""

import os
import sys


def _needs_cpu_reexec() -> bool:
    return bool(
        os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("GP_TPU_TESTS") != "1"
    )


if not _needs_cpu_reexec():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    if not _needs_cpu_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
