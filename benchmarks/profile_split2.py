#!/usr/bin/env python
"""Post-rewrite split: new preprocess vs kernel (scalar outputs, no fetch)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_DIR = "/root/reference/unitest/training_data/fast5"
MODEL1 = "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5"
MODEL2 = "/root/reference/model/ecoli/ecoli_win13_50ep_model2.h5"

P = lambda *a: print(*a, flush=True)


def timed(f, *args, n=3):
    np.asarray(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


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
    db = jax.device_put(b.buf, jax.devices()[0])

    def pre_only(buf):
        v = engine._unpack(buf)
        windows, feats = device_preprocess_batch(
            v["sig"], v["starts"], v["mean"], v["std"],
            v["color"].astype(jnp.float32),
            v["sbounds"], v["bbounds"], v["shift"], v["scale"],
        )
        return windows.sum() + feats.sum()

    P(f"preprocess-only(new): {timed(jax.jit(pre_only), db):.1f} ms")

    t_len = engine.window
    rng = np.random.default_rng(0)
    sig_nb = jnp.asarray(rng.normal(size=(engine.n_rows, GP)), jnp.bfloat16)
    feats_nb = jnp.asarray(rng.normal(size=(engine.n_rows, GP)), jnp.bfloat16)
    wv = jnp.asarray(engine.w_max, jnp.int32)

    def k_sum(s, f, w):
        out = stack_logits_full(
            engine._ws, s, f, t_len=t_len, block=engine.block,
            want_probs=False, w_valid=w,
        )
        y = jnp.argmax(out, axis=-1).astype(jnp.uint8)
        return y.sum()

    P(f"kernel+argmax (scalar out): {timed(jax.jit(k_sum), sig_nb, feats_nb, wv):.1f} ms")


if __name__ == "__main__":
    main()
