"""Tracing / roofline instrumentation.

The reference declares tracing/dhat but never wires them (SURVEY.md §5);
the TPU-native equivalents are (a) JAX profiler traces viewable in
Perfetto/TensorBoard and (b) analytic op counters for the NTT roofline
metric required by BASELINE.json ("NTT kernel GF-ops vs roofline").
"""

from __future__ import annotations

import contextlib
import math
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ckks-trace"):
    """Capture a JAX profiler trace (open in Perfetto / TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def ntt_butterfly_count(degree: int, channels: int) -> int:
    """Modular butterflies in one forward/inverse NTT pass."""
    return channels * (degree // 2) * int(math.log2(degree))


def mult_op_counts(degree: int, num_channels: int, digit_size: int) -> dict:
    """Analytic per-multiply (relin+rescale) op budget at one level.

    Channel-NTT passes: tensor d2 inverse (L) + fused gadget accumulate
    (D*(L+g')) + mod-down (g' + L per component, x2) + ct rescale
    (1 + (L-1) per component, x2).
    """
    L = num_channels
    g = digit_size
    D = -(-L // g)
    E = L + g
    ntts = L + D * E + 2 * (g + L) + 2 * (1 + (L - 1))
    butterflies = (degree // 2) * int(math.log2(degree)) * ntts
    pointwise = degree * (3 + 2 * D * E + 4 * L)  # tensor + key mul + fixups
    return {
        "channel_ntts": ntts,
        "butterflies": butterflies,
        "modmuls": butterflies + pointwise,
    }


class Stopwatch:
    """Wall-clock timer with device sync, for quick kernel measurements."""

    def __init__(self):
        self.laps: list[float] = []

    @contextlib.contextmanager
    def lap(self, result=None):
        import jax

        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready() if hasattr(
                    x, "block_until_ready") else x,
                result,
            )
        self.laps.append(time.perf_counter() - t0)

    @property
    def best(self) -> float:
        return min(self.laps)


def gops_per_sec(op_count: int, seconds: float) -> float:
    return op_count / seconds / 1e9
