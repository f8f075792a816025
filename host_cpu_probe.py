"""Host CPU-scaling ceiling probe (no Spark).

Fixed total work (32 md5 units) across N processes. On an unshared 32-core
box this scales ~linearly to 32; on this sandbox's VM the host throttles
beyond ~8 concurrent cores, which caps ANY engine's measurable scaling
efficiency there. bench_scaling.py therefore demonstrates N vs 4N inside the
linear region (local[2] vs local[8]) and cites this probe.
"""

import hashlib
import time
from multiprocessing import Pool


def work(seed: int) -> int:
    h = 0
    for i in range(400_000):
        h ^= int.from_bytes(hashlib.md5(f"{seed}-{i}".encode()).digest()[:8], "big")
    return h


def main() -> None:
    results = {}
    for n in (1, 2, 4, 8, 16, 32):
        with Pool(n) as p:
            t0 = time.perf_counter()
            p.map(work, range(32))
            results[n] = time.perf_counter() - t0
            print(f"{n:2d} procs: {results[n]:.2f}s")
    e28 = (results[2] / results[8]) / 4
    e832 = (results[8] / results[32]) / 4
    print(f"host efficiency 2->8: {e28:.2f}, 8->32: {e832:.2f}")


if __name__ == "__main__":
    main()
