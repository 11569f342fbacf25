"""Tracing / profiling hooks (SURVEY.md §6.1).

``jax.profiler`` traces around the hot phases (kernel build / Cholesky /
sampler step) plus a roofline accounting helper: achieved FLOP/s of the
fit path vs the chip's peak, the evidence BASELINE.json:5 asks for
("speed-of-light per chip").
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(profile_dir: str | None):
    """TensorBoard-readable trace of the enclosed block (no-op if None)."""
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield


named_scope = jax.named_scope  # re-export for phase annotations


#: advertised dense peak of the one attached chip, bf16/f32 via MXU.
#: v5e: 394 TFLOP/s bf16, ~98 TFLOP/s f32 (public spec sheet numbers).
V5E_PEAK_FLOPS = {"bfloat16": 394e12, "float32": 98e12}


def fit_flops(n: int) -> float:
    """FLOPs of one exact-GP fit: n^2 kernel build (~10 flops/elem) +
    n^3/3 Cholesky + 2n^2 solves."""
    return 10.0 * n * n + n ** 3 / 3.0 + 2.0 * n * n


def roofline(n: int, wall_s: float, dtype: str = "float32") -> dict:
    """Achieved vs peak FLOP/s for an N-point fit that took wall_s."""
    achieved = fit_flops(n) / wall_s
    peak = V5E_PEAK_FLOPS.get(dtype, V5E_PEAK_FLOPS["float32"])
    return {
        "n": n,
        "wall_s": wall_s,
        "achieved_flops": achieved,
        "peak_flops": peak,
        "fraction_of_peak": achieved / peak,
    }


def timed(fn, *args, warmup: int = 1, iters: int = 3):
    """Best-of wall-clock of a jitted callable (blocks on outputs)."""

    def run():
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    for _ in range(warmup):
        run()
    return min(run() for _ in range(iters))
