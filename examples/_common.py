"""Shared helpers for the runnable examples.

Every example mirrors its reference counterpart (reference: examples/*.rs):
it computes a plaintext reference result alongside the encrypted pipeline,
prints a small report, and exits nonzero if the max error exceeds an
explicit noise bound — executable acceptance tests.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("CKKS_PLATFORM"):
    # explicit platform override (the environment's sitecustomize pre-imports
    # jax, so JAX_PLATFORMS in the env is captured before we run)
    jax.config.update("jax_platforms", os.environ["CKKS_PLATFORM"])

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402


def check_bound(name: str, max_err: float, bound: float) -> None:
    if max_err <= bound:
        print(f"OK  {name}: max error {max_err:.3e} <= bound {bound:.3e}")
    else:
        print(f"FAIL {name}: max error {max_err:.3e} EXCEEDS bound {bound:.3e}")
        sys.exit(1)


def max_abs_err(expected, actual) -> float:
    e = np.asarray(expected, dtype=np.float64)
    a = np.asarray(actual, dtype=np.float64)
    return float(np.max(np.abs(e - a)))


def table(headers, rows) -> str:
    """Minimal aligned ASCII table (parity: reference src/table.rs)."""
    cols = [[str(h)] for h in headers]
    for row in rows:
        for c, cell in zip(cols, row):
            c.append(str(cell))
    widths = [max(len(x) for x in c) for c in cols]
    def fmt(cells):
        return " | ".join(x.ljust(w) for x, w in zip(cells, widths))
    lines = [fmt([c[0] for c in cols]), "-+-".join("-" * w for w in widths)]
    for i in range(1, len(cols[0])):
        lines.append(fmt([c[i] for c in cols]))
    return "\n".join(lines)
