#!/usr/bin/env python
"""Split device time: segmented preprocessing vs fused Pallas kernel.

Also sweeps the kernel block size, since many-small-matmul issue cost is
the suspected limiter.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_DIR = "/root/reference/unitest/training_data/fast5"
MODEL1 = "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5"
MODEL2 = "/root/reference/model/ecoli/ecoli_win13_50ep_model2.h5"

P = lambda *a: print(*a, flush=True)


def timed(fn, *args, n=3):
    out = fn(*args)
    np.asarray(jax_leaves_first(out))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax_leaves_first(out))
        best = min(best, time.perf_counter() - t0)
    return best


def jax_leaves_first(out):
    import jax

    return jax.tree_util.tree_leaves(out)[0]


def main():
    import jax
    import jax.numpy as jnp

    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.io import get_read_data, list_fast5_files
    from nanoreviser_tpu.ops.reviser_kernel import GP, stack_logits_full
    from nanoreviser_tpu.signal.device_prep import device_preprocess_batch

    engine = StreamingReviser(MODEL1, MODEL2)
    fns = list_fast5_files(TRAIN_DIR)[:20]
    reads = [(fn, get_read_data(os.path.join(TRAIN_DIR, fn))) for fn in fns]
    b = engine._new_batch()
    for name, rd in reads:
        if not engine._add_read(b, name, rd):
            break
    engine._finalize(b)
    P(f"batch: {len(b.meta)} reads, {b.rows} rows")
    db = jax.device_put(np.stack([b.buf])[0], jax.devices()[0])

    t_len = engine.window

    # 1) preprocess only
    def pre_only(buf):
        v = engine._unpack(buf)
        windows, feats = device_preprocess_batch(
            v["sig"], v["starts"], v["mean"], v["std"],
            v["color"].astype(jnp.float32),
            v["sbounds"], v["bbounds"], v["shift"], v["scale"],
        )
        return windows.sum() + feats.sum()

    f_pre = jax.jit(pre_only)
    P(f"preprocess-only: {timed(f_pre, db)*1e3:.1f} ms")

    # 2) preprocess + pad/cast (the kernel's input prep)
    def pre_pad(buf):
        v = engine._unpack(buf)
        windows, feats = device_preprocess_batch(
            v["sig"], v["starts"], v["mean"], v["std"],
            v["color"].astype(jnp.float32),
            v["sbounds"], v["bbounds"], v["shift"], v["scale"],
        )
        sig_nb = jnp.pad(windows, ((0, 0), (0, GP - windows.shape[1]))).astype(jnp.bfloat16)
        feats_nb = jnp.pad(feats, ((0, 0), (0, GP - feats.shape[1]))).astype(jnp.bfloat16)
        return sig_nb.sum(), feats_nb.sum()

    f_pp = jax.jit(pre_pad)
    P(f"preprocess+pad: {timed(f_pp, db)*1e3:.1f} ms")

    # 3) kernel only (fixed random per-base inputs), block sweep
    n_rows = engine.n_rows
    rng = np.random.default_rng(0)
    sig_nb = jnp.asarray(rng.normal(size=(n_rows, GP)), jnp.bfloat16)
    feats_nb = jnp.asarray(rng.normal(size=(n_rows, GP)), jnp.bfloat16)
    wv = jnp.asarray(engine.w_max, jnp.int32)

    for block in (256, 512, 1024, 2048):
        try:
            def k_only(s, f, w):
                out = stack_logits_full(
                    engine._ws, s, f, t_len=t_len, block=block,
                    want_probs=False, w_valid=w,
                )
                return out

            f_k = jax.jit(k_only)
            dt = timed(f_k, sig_nb, feats_nb, wv)
            P(f"kernel-only block={block}: {dt*1e3:.1f} ms")
        except Exception as exc:  # noqa: BLE001
            P(f"kernel-only block={block}: FAILED {type(exc).__name__}: "
              f"{str(exc)[:200]}")


if __name__ == "__main__":
    main()
