#!/usr/bin/env python
"""On-device window-gather prototypes, timed resident on the chip.

The round-2 design gathered windows on device via vmapped dynamic_slice at
158 ms/batch; host gathering fixed that but made the upload 121 B/base and
the ~60 MB/s tunnel is now the binding constraint. If any of these gathers
runs in <20 ms/batch, the upload can ship raw signal (~17 B/base) instead
of windows (100 B/base).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

W = 393216          # windows per batch (engine default)
S = 4 * 1024 * 1024 # signal samples per batch (~8.5/base * 393k + pad)
Q = 50


def timeit(name, fn, *args):
    out = fn(*args)                      # compile
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:8])  # force
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
        ts.append(time.time() - t0)
    print(f"{name:30s} {min(ts)*1e3:8.1f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    sig = rng.integers(-500, 500, S, dtype=np.int16)
    pos0 = np.sort(rng.integers(0, S - Q - 1, W)).astype(np.int32)
    dsig = jax.device_put(sig)
    dpos = jax.device_put(pos0)
    jax.block_until_ready((dsig, dpos))

    @jax.jit
    def flat_take(sig, pos0):
        idx = pos0[:, None] + jnp.arange(Q, dtype=jnp.int32)[None, :]
        return jnp.take(sig, idx.reshape(-1), axis=0,
                        unique_indices=False, indices_are_sorted=False
                        ).reshape(W, Q)

    @jax.jit
    def flat_take_sorted(sig, pos0):
        idx = pos0[:, None] + jnp.arange(Q, dtype=jnp.int32)[None, :]
        return jnp.take(sig, idx.reshape(-1), axis=0,
                        indices_are_sorted=True).reshape(W, Q)

    @jax.jit
    def unfold_rowtake(sig, pos0):
        # unfold[s, q] = sig[s + q] via Q static slices, then a row gather
        cols = [jax.lax.slice(sig, (q,), (q + S - Q,)) for q in range(Q)]
        unfold = jnp.stack(cols, axis=1)            # [S-Q, Q] int16
        return jnp.take(unfold, pos0, axis=0, indices_are_sorted=True)

    @jax.jit
    def unfold_rowtake_bf16(sig, pos0):
        cols = [jax.lax.slice(sig, (q,), (q + S - Q,)) for q in range(Q)]
        unfold = jnp.stack(cols, axis=1).astype(jnp.bfloat16)
        return jnp.take(unfold, pos0, axis=0, indices_are_sorted=True)

    @jax.jit
    def dynslice_vmap(sig, pos0):
        def one(p):
            return jax.lax.dynamic_slice(sig, (p,), (Q,))
        return jax.vmap(one)(pos0)

    timeit("flat_take", flat_take, dsig, dpos)
    timeit("flat_take_sorted", flat_take_sorted, dsig, dpos)
    timeit("unfold_rowtake", unfold_rowtake, dsig, dpos)
    timeit("unfold_rowtake_bf16", unfold_rowtake_bf16, dsig, dpos)
    timeit("dynslice_vmap", dynslice_vmap, dsig, dpos)

    # correctness spot check
    got = np.asarray(unfold_rowtake(dsig, dpos))
    want = np.stack([sig[p : p + Q] for p in pos0[:100]])
    assert (got[:100] == want).all()
    got2 = np.asarray(flat_take(dsig, dpos))
    assert (got2[:100] == want).all()
    print("correct")


if __name__ == "__main__":
    main()
