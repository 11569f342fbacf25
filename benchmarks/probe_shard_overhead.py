"""Diagnose the virtual-mesh sharding overhead (round 4).

The constant-work gate (tests/test_weak_scaling.py) measured 0.59 at
256 chains / n=64 / 8 virtual devices on 4 host cores.  Separate the
candidate causes:

  a) thread oversubscription (8 device threads on 4 cores)
     -> compare 2/4/8-device meshes at the same total chains;
  b) per-transition work too small to amortize dispatch+collectives
     -> compare n=64 against the config-#3 posterior size n=500.

Run:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/probe_shard_overhead.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

from benchmarks.weak_scaling import problem, run_sharded, run_unsharded  # noqa: E402


def ab(n, n_chains, num_warmup=40, num_samples=60):
    log_post, init, key = problem(n=n, n_chains=n_chains)
    run_unsharded(log_post, init, key, 2, 2)
    w_un, _ = run_unsharded(log_post, init, key, num_warmup, num_samples)
    print(f"n={n} chains={n_chains}: unsharded {w_un:7.2f}s", flush=True)
    for d in (2, 4, 8):
        run_sharded(log_post, init, key, 2, 2, d)
        w_sh, _ = run_sharded(log_post, init, key, num_warmup, num_samples, d)
        print(f"n={n} chains={n_chains}: sharded({d}) {w_sh:7.2f}s  "
              f"eff {w_un / w_sh:.2f}", flush=True)


if __name__ == "__main__":
    t0 = time.perf_counter()
    ab(64, 256)
    ab(500, 64)
    print(f"total {time.perf_counter() - t0:.0f}s")
