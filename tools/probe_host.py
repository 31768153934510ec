"""Host-health probe: single-core speed vs 32-way parallel scaling.

The bench floor protocol (BASELINE.md) exists because this container
shows recurring host-interference episodes. This probe makes an
episode OBSERVABLE and quantifiable without Spark: it measures
single-process integer throughput and the aggregate throughput of 32
concurrent processes. On a healthy host the scaling factor approaches
the vCPU count; during an episode it collapses (r12 close recorded
oscillation between 9.7x and 21.3x within two minutes while the judge
headline keys inflated 5-25x).

Run it next to any bench whose numbers look off:

    python tools/probe_host.py [reps]
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ProcessPoolExecutor

N = 3_000_000


def spin(n: int) -> float:
    x = 0
    t0 = time.time()
    for i in range(n):
        x += i * i
    return time.time() - t0


def probe() -> dict:
    # min-of-3 single-process baseline: a single unwarmed sample is
    # noisy and systematically deflates scaling_x (r12 ADVICE).
    t1 = min(spin(N) for _ in range(3))
    with ProcessPoolExecutor(32) as ex:
        # Warm the pool first (worker spawn was previously charged to
        # the 32-way wall time, deflating scaling_x — r12 ADVICE).
        list(ex.map(spin, [N // 100] * 32))
        t0 = time.time()
        list(ex.map(spin, [N] * 32))
        wall = time.time() - t0
    single = N / t1 / 1e6
    agg = 32 * N / wall / 1e6
    return {
        "single_mops": round(single, 1),
        "agg32_mops": round(agg, 1),
        "scaling_x": round(agg / single, 1),
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for i in range(reps):
        r = probe()
        print(
            f"rep{i}: 1p {r['single_mops']:6.1f} Mops | "
            f"32p {r['agg32_mops']:7.1f} Mops | "
            f"scaling {r['scaling_x']:5.1f}x",
            flush=True,
        )
        if i + 1 < reps:
            time.sleep(10)


if __name__ == "__main__":
    main()
