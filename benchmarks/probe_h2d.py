#!/usr/bin/env python
"""True h2d bandwidth probe: device_put + consume + fetch scalar forces the
transfer; compare against resident-buffer compute to separate h2d from RTT.
Tests zeros vs random int16 (tunnel may compress) and repeated trials."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dev = jax.devices()[0]
    print(dev)

    @jax.jit
    def consume(x):
        return jnp.sum(x[::4096].astype(jnp.float32))

    xd = None
    for kind in ("random", "zeros"):
        for mb in (8, 32):
            n = mb * 512 * 1024
            if kind == "random":
                x = np.random.randint(-500, 500, size=(n,), dtype=np.int16)
            else:
                x = np.zeros(n, np.int16)
            float(consume(jax.device_put(x, dev)))  # warm compile
            ts = []
            for trial in range(5):
                t0 = time.time()
                xd = jax.device_put(x, dev)
                float(consume(xd))
                ts.append(time.time() - t0)
            t0 = time.time()
            float(consume(xd))
            rtt = time.time() - t0
            best = min(ts)
            med = sorted(ts)[len(ts) // 2]
            print(f"{kind:6s} {mb:3d} MB: best {best*1e3:7.1f} ms med {med*1e3:7.1f} ms"
                  f" resident {rtt*1e3:6.1f} ms -> h2d best {mb/max(best-rtt,1e-9):7.1f} MB/s")


if __name__ == "__main__":
    main()
