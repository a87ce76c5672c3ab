#!/usr/bin/env python
"""Round 2 of gather prototypes: lax.gather slices, split unfold/take costs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

W = 393216
S = 4 * 1024 * 1024
Q = 50


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
        ts.append(time.time() - t0)
    print(f"{name:30s} {min(ts)*1e3:8.1f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    sig = rng.integers(-500, 500, S, dtype=np.int16)
    pos0 = np.sort(rng.integers(0, S - Q - 128, W)).astype(np.int32)
    dsig = jax.device_put(sig)
    dpos = jax.device_put(pos0)
    jax.block_until_ready((dsig, dpos))

    @jax.jit
    def slice_gather(sig, pos0):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
        return jax.lax.gather(sig, pos0[:, None], dn, slice_sizes=(Q,),
                              indices_are_sorted=True, mode="clip")

    @jax.jit
    def unfold_only(sig):
        cols = [jax.lax.slice(sig, (q,), (q + S - Q,)) for q in range(Q)]
        return jnp.stack(cols, axis=1)

    @jax.jit
    def rowtake_only(unfold, pos0):
        return jnp.take(unfold, pos0, axis=0, indices_are_sorted=True)

    @jax.jit
    def rowgather_slices(unfold, pos0):
        # gather rows as (1, Q) slices from the 2D unfold
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
        return jax.lax.gather(unfold, pos0[:, None], dn, slice_sizes=(1, Q),
                              indices_are_sorted=True, mode="clip")

    # gather of WIDE rows: reshape sig to [S//128, 128], take row pairs,
    # then select the 50 window lanes via pltpu-style rolls in plain XLA
    @jax.jit
    def rowpair_take(sig, pos0):
        sig2d = sig.reshape(S // 128, 128)
        r = pos0 // 128
        c = pos0 % 128                                   # [W]
        a = jnp.take(sig2d, r, axis=0, indices_are_sorted=True)      # [W,128]
        b = jnp.take(sig2d, r + 1, axis=0, indices_are_sorted=True)  # [W,128]
        two = jnp.concatenate([a, b], axis=1)            # [W,256]
        idx = c[:, None] + jnp.arange(Q, dtype=jnp.int32)[None, :]
        return jnp.take_along_axis(two, idx, axis=1)

    timeit("slice_gather", slice_gather, dsig, dpos)
    unfold = timeit("unfold_only", unfold_only, dsig)
    timeit("rowtake_only", rowtake_only, unfold, dpos)
    timeit("rowgather_slices", rowgather_slices, unfold, dpos)
    timeit("rowpair_take", rowpair_take, dsig, dpos)

    want = np.stack([sig[p : p + Q] for p in pos0[:64]])
    for f, args in ((slice_gather, (dsig, dpos)), (rowpair_take, (dsig, dpos))):
        got = np.asarray(f(*args))[:64]
        assert (got == want).all(), f
    print("correct")


if __name__ == "__main__":
    main()
