"""Gate on the sharding machinery's weak-scaling overhead (VERDICT r2 #6).

On the 8-virtual-device CPU mesh every device shares the same host
cores, so running the SAME chain population sharded vs unsharded
executes identical FLOPs on identical silicon; the wall-clock ratio
isolates what the sharding layer (shard_map dispatch, pooled-adaptation
collectives, device-folded RNG) costs.  BASELINE.json:11's >= 80%
efficiency gate is applied to that ratio here; the real-pod protocol is
docs/multihost.md + benchmarks/weak_scaling.py.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from benchmarks.weak_scaling import constant_work_efficiency  # noqa: E402
import pytest

# slow tier (VERDICT r2 item 8): minutes-long on 4 host cores; run via
# `make test-all` / CI. The default `make test` gate stays < 10 min.
pytestmark = pytest.mark.slow


def test_sharding_overhead_efficiency_gate():
    # moderate sizes keep this under ~1 min on 4 host cores while the
    # collection phase is long enough to dominate compile/dispatch noise.
    # n_devices=None -> min(virtual devices, physical cores): an
    # oversubscribed mesh (8 device threads on 4 cores) measures XLA-CPU
    # collective busy-waiting, not the sharding layer — measured round 4:
    # eff 1.19 at 2/4 devices vs 0.49 at 8 on this 4-core host
    # (benchmarks/probe_shard_overhead.py, BASELINE.md round-4).
    eff = constant_work_efficiency(
        n_chains=256, num_warmup=60, num_samples=60, verbose=True
    )
    assert eff >= 0.8, (
        f"sharded ChEES (non-oversubscribed virtual mesh) is "
        f"{1/eff:.2f}x slower than the identical unsharded run — "
        f"sharding overhead exceeds the 20% weak-scaling budget "
        f"(BASELINE.json:11)"
    )
