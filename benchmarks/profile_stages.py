#!/usr/bin/env python
"""Stage-level profile of the streaming inference pipeline.

Times each stage of the production path independently on the 100-read
training set so optimization effort goes at the actual bottleneck:
  decode    host fast5 -> ReadData (serial; h5py holds the GIL)
  compact   host ReadData -> CompactRead (interval union, moments, feats)
  pool      decode+compact via 2 hostpipe worker processes (the CLI path)
  assemble  packing compacted reads into fixed-shape batch buffers
  h2d       device_put of the batch buffers, FORCED by a consuming fetch
            (axon's block_until_ready returns at dispatch — async timing lies)
  device    the jitted gather+model program, amortized over chained
            dispatches so the ~25 ms tunnel RTT divides out
  merge     vectorized revision merge per read
  e2e       engine.revise_stream end to end (pre-compacted reads)
  e2e_pool  PrepPool -> engine.revise_stream (the production path)

Emits one JSON dict; bench.py folds these numbers into its output.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_DIR = "/root/reference/unitest/training_data/fast5"
MODEL1 = "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5"
MODEL2 = "/root/reference/model/ecoli/ecoli_win13_50ep_model2.h5"


def profile(out=None, quiet=False):
    import jax

    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.infer.hostpipe import PrepPool
    from nanoreviser_tpu.infer.merge import merge_revision
    from nanoreviser_tpu.io import get_read_data, list_fast5_files
    from nanoreviser_tpu.signal.host_prep import compact_read

    def say(msg):
        if not quiet:
            print(msg, flush=True)

    fns = list_fast5_files(TRAIN_DIR)
    say(f"{len(fns)} reads")
    out = {} if out is None else out

    t0 = time.time()
    reads = [(fn, get_read_data(os.path.join(TRAIN_DIR, fn))) for fn in fns]
    out["decode_s"] = time.time() - t0
    say(f"decode: {out['decode_s']:.3f}s ({out['decode_s']/len(fns)*1e3:.1f} ms/read)")

    t0 = time.time()
    compact = [(fn, compact_read(rd)) for fn, rd in reads]
    out["compact_s"] = time.time() - t0
    say(f"compact: {out['compact_s']:.3f}s ({out['compact_s']/len(fns)*1e3:.1f} ms/read)")

    from nanoreviser_tpu.infer.wire import encode_read

    t0 = time.time()
    wire = [(fn, encode_read(c)) for fn, c in compact]
    out["encode_s"] = time.time() - t0
    say(f"wire encode: {out['encode_s']:.3f}s "
        f"({out['encode_s']/len(fns)*1e3:.2f} ms/read)")

    with PrepPool(2) as pool:
        list(pool.stream(TRAIN_DIR, fns[:4]))      # warm the workers
        t0 = time.time()
        n_ok = sum(1 for _, p, e in pool.stream(TRAIN_DIR, fns) if e is None)
        out["pool_s"] = time.time() - t0
        assert n_ok == len(fns)
        say(f"pool decode+compact (2 proc): {out['pool_s']:.3f}s "
            f"({len(fns)/out['pool_s']:.1f} reads/s)")

    engine = StreamingReviser(MODEL1, MODEL2)

    t0 = time.time()
    batches = []
    b = engine._new_batch()
    for (name, rd), (_, c) in zip(reads, wire):
        if not engine._add_read(b, name, rd, c):
            batches.append(b)
            b = engine._new_batch()
            assert engine._add_read(b, name, rd, c)
    if b.meta:
        batches.append(b)
    # per-batch tier selection, as the engine's submit path does for
    # 1-device groups (one shared tier would bill the small tail batch at
    # full-tier bytes; n_dev > 1 groups do share a tier)
    tiers = [engine._pick_tier([bt]) for bt in batches]
    packed = [engine._finalize(bt, t) for bt, t in zip(batches, tiers)]
    out["assemble_s"] = time.time() - t0
    upload_mb = sum(a.nbytes for p in packed for a in p.values()) / 1e6
    out["upload_mb"] = round(upload_mb, 1)
    say(f"assemble: {out['assemble_s']:.3f}s ({len(batches)} batches, "
        f"{upload_mb:.1f} MB upload)")

    fns_dev = [engine._get_fn(t) for t in tiers]
    bufs = [{k: v[None] for k, v in p.items()} for p in packed]

    # h2d (forced): put + run + fetch one byte, minus the resident run cost
    def put_run_fetch():
        db = [jax.device_put(bf, engine._buf_sharding) for bf in bufs]
        outs = [f(engine._ws, d) for f, d in zip(fns_dev, db)]
        _ = [np.asarray(jax.tree_util.tree_leaves(o)[0][:1, :1]) for o in outs]
        return db
    db = put_run_fetch()
    t0 = time.time()
    put_run_fetch()
    put_fetch_s = time.time() - t0

    # device, resident + amortized over chains (RTT divides out)
    def run_k(k):
        t0 = time.time()
        for _ in range(k):
            outs = [f(engine._ws, d) for f, d in zip(fns_dev, db)]
        _ = [np.asarray(jax.tree_util.tree_leaves(o)[0][:1, :1]) for o in outs]
        return time.time() - t0
    run_k(1)
    rtt = min(run_k(1) for _ in range(3))
    t8 = min(run_k(9) for _ in range(2))
    out["device_s"] = round((t8 - rtt) / 8, 3)
    out["h2d_s"] = round(max(put_fetch_s - rtt, 0.0), 3)
    say(f"h2d (forced): {out['h2d_s']:.3f}s ({upload_mb:.1f} MB, "
        f"{upload_mb/max(out['h2d_s'],1e-9):.0f} MB/s)")
    say(f"device (amortized): {out['device_s']:.3f}s "
        f"({out['device_s']/len(batches)*1e3:.1f} ms/batch)")

    t = engine.window
    host_outs = [np.asarray(jax.tree_util.tree_leaves(f(engine._ws, d))[0])
                 for f, d in zip(fns_dev, db)]
    from nanoreviser_tpu.infer.merge import calibrate_center_offset

    off = None
    t0 = time.time()
    n_m = 0
    for bt, packed_all in zip(batches, host_outs):
        pk_all = packed_all[0]
        for name, rd, r0 in bt.meta:
            wr = max(rd.n_bases - t, 0)
            pk = pk_all[r0 : r0 + wr]
            y1 = (pk >> 3).astype(np.int32)
            y2 = (pk & 7).astype(np.int32)
            if off is None:
                off, _ = calibrate_center_offset(rd.bases, y1, t)
            merge_revision(rd.bases, y1, y2, align="center", window=t,
                           center_offset=off)
            n_m += 1
    out["merge_s"] = time.time() - t0
    say(f"merge: {out['merge_s']:.3f}s ({out['merge_s']/n_m*1e3:.1f} ms/read)")

    for _ in range(2):
        t0 = time.time()
        errors = []
        n = sum(1 for _ in engine.revise_stream(iter(wire), errors=errors))
        out["e2e_s"] = time.time() - t0
        assert not errors, errors[:2]
    say(f"e2e (pre-encoded): {out['e2e_s']:.3f}s "
        f"({len(fns)/out['e2e_s']:.1f} reads/s)")

    with PrepPool(2) as pool:
        list(pool.stream(TRAIN_DIR, fns[:4]))
        for _ in range(2):
            def items(p=pool):
                for fn, pr, err in p.stream(TRAIN_DIR, fns):
                    assert err is None, (fn, err)
                    yield fn, pr
            t0 = time.time()
            errors = []
            n = sum(1 for _ in engine.revise_stream(items(), errors=errors))
            out["e2e_pool_s"] = time.time() - t0
            assert not errors, errors[:2]
    say(f"e2e (PrepPool production): {out['e2e_pool_s']:.3f}s "
        f"({len(fns)/out['e2e_pool_s']:.1f} reads/s)")

    out = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in out.items()}
    out["n_batches"] = len(batches)
    out["n_reads"] = len(fns)
    out["total_rows"] = int(sum(bt.rows for bt in batches))
    out["batch_windows"] = int(engine.w_max)
    return out


def main():
    print(json.dumps(profile()))


if __name__ == "__main__":
    main()
