"""On-chip tuning sweeps for the fused multiply composite.

Measures the north-star op (ct-ct mult + relin + rescale) across a small
grid of batch sizes / digit sizes / configurations using bench.py's
marginal-cost methodology, and prints one JSON line per point. Use this
to re-validate the default constants in ``bench.py`` (batch knee,
digit_size sweet spot) when the hardware or kernels change.

    python tools/tune.py            # default grid (~minutes of chip time)
    python tools/tune.py batch      # batch knee only
    python tools/tune.py digit      # digit_size sweep only
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import _measure  # noqa: E402


def point(tag, degree, primes, bits, digit, batch, iters=48, warmup=2):
    sec = _measure(degree, primes, bits, digit, batch, iters, warmup)
    rec = {
        "tag": tag,
        "degree": degree,
        "chain": f"{primes}x{bits}b",
        "digit_size": digit,
        "batch": batch,
        "mults_per_s": round(1.0 / sec, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def sweep_batch():
    for b in (16, 32, 48, 64):
        point("batch-knee", 1 << 14, 8, 31, 4, b)


def sweep_digit():
    for d in (2, 4, 8):
        point("digit-sweep", 1 << 14, 8, 31, d, 32)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "batch"):
        sweep_batch()
    if which in ("all", "digit"):
        sweep_digit()


if __name__ == "__main__":
    main()
