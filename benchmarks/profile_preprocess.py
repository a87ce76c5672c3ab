#!/usr/bin/env python
"""Which part of device_preprocess_batch costs 190 ms? Cumulative-prefix
timing (DCE prunes everything not feeding the returned sum)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_DIR = "/root/reference/unitest/training_data/fast5"
MODEL1 = "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5"
MODEL2 = "/root/reference/model/ecoli/ecoli_win13_50ep_model2.h5"

P = lambda *a: print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.io import get_read_data, list_fast5_files

    engine = StreamingReviser(MODEL1, MODEL2)
    fns = list_fast5_files(TRAIN_DIR)[:20]
    reads = [(fn, get_read_data(os.path.join(TRAIN_DIR, fn))) for fn in fns]
    b = engine._new_batch()
    for name, rd in reads:
        if not engine._add_read(b, name, rd):
            break
    engine._finalize(b)
    db = jax.device_put(b.buf, jax.devices()[0])

    def pieces(buf, upto):
        v = engine._unpack(buf)
        signal, starts = v["sig"], v["starts"]
        ab_mean, ab_std = v["mean"], v["std"]
        colors = v["color"].astype(jnp.float32)
        sig_bounds, base_bounds = v["sbounds"], v["bbounds"]
        shift_r, scale_r = v["shift"], v["scale"]
        query_len = 50

        s_pad = signal.shape[0]
        n_pad = starts.shape[0]
        x = signal.astype(jnp.float32)
        sidx = jnp.arange(s_pad, dtype=jnp.int32)
        nidx = jnp.arange(n_pad, dtype=jnp.int32)
        s_valid = sig_bounds[-1]
        smask = sidx < s_valid

        from nanoreviser_tpu.signal.device_prep import _segment_ids

        rid_s = _segment_ids(sig_bounds, s_pad)
        rid_b = _segment_ids(base_bounds, n_pad)
        sig_len = sig_bounds[1:] - sig_bounds[:-1]
        shift_b = shift_r[rid_b]
        scale_b = scale_r[rid_b]
        sig_len_b = sig_len[rid_b]
        sig_off_b = sig_bounds[:-1][rid_b]
        if upto == "segids":
            return shift_b.sum() + rid_s.sum() + sig_len_b.sum()

        nxt = jnp.concatenate([starts[1:], starts[-1:]])
        prev = jnp.concatenate([starts[:1], starts[:-1]])
        is_last = nidx == (base_bounds[1:][rid_b] - 1)
        last_dur = jnp.where(starts - prev < 5, 3, 5).astype(starts.dtype)
        ends = jnp.where(is_last, starts + last_dur, nxt)
        durations = (ends - starts).astype(jnp.float32)
        if upto == "durations":
            return durations.sum()

        xc = jnp.where(smask, x - shift_r[rid_s], 0.0)
        cs = jnp.concatenate([jnp.zeros(1), jnp.cumsum(xc)])
        cs2 = jnp.concatenate([jnp.zeros(1), jnp.cumsum(xc * xc)])
        st_g = jnp.clip(starts + sig_off_b, 0, s_pad)
        en_g = jnp.clip(ends + sig_off_b, 0, s_pad)
        n_int = en_g - st_g
        n_samp = jnp.maximum(n_int.astype(jnp.float32), 1.0)
        mean_long = (cs[en_g] - cs[st_g]) / n_samp
        var_long = (cs2[en_g] - cs2[st_g]) / n_samp - mean_long * mean_long
        if upto == "prefix":
            return mean_long.sum() + var_long.sum()

        EXACT_K = 128
        offs = jnp.arange(EXACT_K, dtype=jnp.int32)
        ev_pos = st_g[:, None] + offs[None, :]
        ev_mask = offs[None, :] < n_int[:, None]
        ev_vals = jnp.where(
            ev_mask, x[jnp.clip(ev_pos, 0, s_pad - 1)] - shift_b[:, None], 0.0
        )
        s1 = jnp.sum(ev_vals, axis=1)
        s2 = jnp.sum(ev_vals * ev_vals, axis=1)
        if upto == "exact":
            return s1.sum() + s2.sum() + mean_long.sum()

        ahead = query_len // 2
        win_st = jnp.maximum(starts - ahead, 0)
        win_en = jnp.minimum(starts + (query_len - ahead), sig_len_b)
        win_len = win_en - win_st
        left = (query_len - win_len + 1) // 2
        cols = jnp.arange(query_len, dtype=jnp.int32)
        pos = (win_st + sig_off_b)[:, None] + (cols[None, :] - left[:, None])
        valid = (cols[None, :] >= left[:, None]) & (
            cols[None, :] < (left + win_len)[:, None]
        )
        gathered = x[jnp.clip(pos, 0, s_pad - 1)]
        windows = jnp.where(
            valid, (gathered - shift_b[:, None]) / scale_b[:, None], 0.0
        )
        if upto == "windows":
            return windows.sum()
        if upto == "windows_only":
            return windows.sum()  # exact path skipped via DCE (no s1 use)
        raise ValueError(upto)

    def timed(f, *args):
        out = f(*args)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    import functools

    for upto in ("segids", "durations", "prefix", "exact", "windows_only",
                 "windows"):
        f = jax.jit(functools.partial(pieces, upto=upto))
        P(f"{upto}: {timed(f, db):.1f} ms")


if __name__ == "__main__":
    main()
