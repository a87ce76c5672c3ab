#!/usr/bin/env python
"""On-chip parity + timing for ops.window_gather (pallas vs xla fallback vs
the bit-exact host-gather reference)."""
import os
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from nanoreviser_tpu.ops.window_gather import (
    ALIGN, BLK, CHUNK, DMA_LEN, Q, pack_block_meta, pack_read_tables,
    window_gather_tpu, window_gather_xla,
)


def reference_path(sig, pos0, shift, scale, vlen, rows_valid):
    from nanoreviser_tpu.signal.device_prep import device_preprocess_batch

    win = np.asarray(sig)[
        np.clip(pos0[:, None] + np.arange(Q)[None, :], 0, len(sig) - 1)
    ].astype(np.int16)
    feats = np.zeros((len(pos0), 6), np.float16)
    windows, _ = device_preprocess_batch(
        jnp.asarray(win), jnp.asarray(vlen), jnp.asarray(feats),
        jnp.asarray(shift), jnp.asarray(scale))
    w = np.asarray(windows).copy()
    w[rows_valid:] = 0.0
    return jnp.pad(jnp.asarray(w), ((0, 0), (0, 128 - Q))).astype(jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    n_rows = 393216
    S = 6 * 1024 * 1024
    sig = rng.integers(-1500, 1500, S, dtype=np.int16)
    gaps = rng.integers(1, 21, n_rows).astype(np.int64)
    # a few stall-like jumps (still <= 50 after compaction)
    gaps[rng.integers(0, n_rows, 500)] = 50
    pos0 = (1024 + np.cumsum(gaps)).astype(np.int32)
    assert pos0[-1] < S - DMA_LEN
    vlen = rng.integers(1, 51, n_rows).astype(np.uint8)
    rows_valid = n_rows - 3 * BLK          # exercise block skipping
    pos0[rows_valid:] = pos0[rows_valid - 1]
    vlen[rows_valid:] = 0

    # split rows across 3 synthetic reads to exercise the read-id tables
    read_id = np.zeros(n_rows, np.uint8)
    read_id[n_rows // 3 :] = 1
    read_id[2 * n_rows // 3 :] = 2
    shifts = [455.1234, 462.875, 440.0317]
    scales = [31.25, 29.111, 33.0333]
    shift = np.array(shifts, np.float32)[read_id]
    scale = np.array(scales, np.float32)[read_id]
    csr, rr, meta = pack_block_meta(pos0, vlen, read_id, S)
    tabs = pack_read_tables(np.array(shifts, np.float32),
                            np.array(scales, np.float32))
    nvalid = np.array([rows_valid // BLK], np.int32)
    sig_rev = sig[::-1].copy()

    d = jax.device_put
    args = (d(sig_rev), d(csr), d(rr), d(nvalid), d(meta), d(tabs))
    jax.block_until_ready(args)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        want = np.asarray(reference_path(sig, pos0, shift, scale, vlen,
                                         int(nvalid[0]) * BLK))
        print("reference done", flush=True)
        cargs = tuple(jax.device_put(np.asarray(a), cpu)
                      for a in (sig_rev, csr, rr, nvalid, meta, tabs))
        got_x = np.asarray(window_gather_xla(*cargs, n_rows=n_rows))
        print("xla done", flush=True)
    bad = (got_x != want)
    print("xla mismatches:", bad.sum())
    assert not bad.sum(), np.argwhere(bad)[:5]

    out = window_gather_tpu(*args, n_rows=n_rows)
    out.block_until_ready()
    got = np.asarray(out)
    bad = (got != want)
    print("tpu mismatches:", bad.sum())
    if bad.sum():
        for i, j in np.argwhere(bad)[:8]:
            print(i, j, got[i, j], want[i, j], "vlen", vlen[i], "pos", pos0[i])
        sys.exit(1)

    # amortized timing: the tunnel's host-blocking RTT is ~25 ms, so time
    # K dispatches + one fetch and subtract the RTT measured with K=1
    def timed(k):
        t0 = time.time()
        for _ in range(k):
            out = window_gather_tpu(*args, n_rows=n_rows)
        _ = np.asarray(out[:1, :1])
        return time.time() - t0
    timed(1)
    rtt = min(timed(1) for _ in range(3))
    t20 = min(timed(21) for _ in range(3))
    print(f"window_gather_tpu: {(t20 - rtt)/20*1e3:.2f} ms/call "
          f"(rtt {rtt*1e3:.1f} ms) / {n_rows} rows")


if __name__ == "__main__":
    main()
