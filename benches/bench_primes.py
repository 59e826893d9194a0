"""Prime-utility microbenchmarks (mirror of the reference's only live
criterion bench, benches/primes.rs:5-42: is_prime MR vs reference oracle;
generate_primes 30b/61b x5 @ degree 8192)."""

from __future__ import annotations

import statistics
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from toy_heaan_ckks_tpu import generate_primes, is_prime
from toy_heaan_ckks_tpu.math.primes import is_prime_reference
from toy_heaan_ckks_tpu import native


def timeit(fn, iters=50):
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        ts.append((time.perf_counter() - t0) / iters)
    return statistics.median(ts)


def main():
    p61 = generate_primes(61, 1, 8192)[0]
    print(f"native runtime active: {native.available()}")
    print(f"is_prime (Miller-Rabin, 61-bit): "
          f"{timeit(lambda: is_prime(p61)) * 1e6:9.2f} us")
    small = 1_073_750_017
    print(f"is_prime_reference (6k+-1 oracle, 30-bit): "
          f"{timeit(lambda: is_prime_reference(small), iters=5) * 1e6:9.2f} us")
    for bits in (30, 61):
        t = timeit(lambda: generate_primes(bits, 5, 8192), iters=5)
        print(f"generate_primes({bits}, 5, 8192): {t * 1e3:9.3f} ms")


if __name__ == "__main__":
    main()
