#!/usr/bin/env python
"""Isolate the host-RSS growth seen in the 10k-read soak (BENCH `soak`).

Measured on the tunnel-attached chip (2026-08-21): every h2d transfer leaks
~95 % of the transferred bytes in NATIVE memory of the axon client —
`jax.device_put` and jit-argument transfer leak identically, d2h fetches
plateau, `jax.live_arrays()` stays constant, and `gc.collect()` reclaims
nothing. The engine's own paths are clean: a PrepPool-only loop over the
100-read set is RSS-flat, and an engine loop leaks exactly
(bytes uploaded) x (passes). The wire format's ~2.3x upload cut shrinks the
leak by the same factor; it cannot be eliminated from user code.

Run: python benchmarks/rss_leak_probe.py [h2d|d2h|jitarg]
Each mode prints RSS after 6 iterations of 5 x 4.4 MB transfers; linear
growth in h2d/jitarg and a plateau in d2h reproduces the attribution.
"""

import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_mb() -> int:
    with open("/proc/self/status") as fp:
        for line in fp:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return 0


def main():
    import jax
    import jax.numpy as jnp

    mode = sys.argv[1] if len(sys.argv) > 1 else "h2d"
    x = np.zeros(4_400_000, np.uint8)
    dx = jax.device_put(x)
    f = jax.jit(lambda b: jnp.sum(b.astype(jnp.int32)))
    np.asarray(f(dx))
    print(f"mode={mode} warm rss {rss_mb()} MB", flush=True)
    for it in range(6):
        if mode == "h2d":
            for _ in range(5):
                r = f(jax.device_put(x))
                np.asarray(r.ravel()[:1])
        elif mode == "jitarg":
            for _ in range(5):
                r = f(x)
                np.asarray(r.ravel()[:1])
        elif mode == "d2h":
            big = jax.jit(lambda b: jnp.tile(b, 2))(dx)
            for _ in range(5):
                np.asarray(big)
        gc.collect()
        print(f"iter {it}: rss {rss_mb()} MB", flush=True)


if __name__ == "__main__":
    main()
