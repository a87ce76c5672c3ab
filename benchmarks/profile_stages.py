#!/usr/bin/env python
"""Stage-level profile of the streaming inference pipeline.

Times each stage of the production path independently on the 100-read
training set so optimization effort goes at the actual bottleneck:
  decode    host fast5 -> ReadData (serial; h5py holds the GIL)
  prep      host ReadData -> PreppedRead (window gather, moments, feats)
  pool      decode+prep via 2 hostpipe worker processes (the CLI path)
  assemble  packing prepped reads into fixed-shape batch buffers
  h2d       device_put of the batch buffers
  device    the jitted normalize+kernel program (k dispatches, one fetch —
            block_until_ready does not actually block under the axon tunnel)
  merge     vectorized revision merge per read
  e2e       engine.revise_stream end to end (pre-prepped reads)
  e2e_pool  PrepPool -> engine.revise_stream (the production path)
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


def main():
    import jax

    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.infer.hostpipe import PrepPool
    from nanoreviser_tpu.infer.merge import merge_revision
    from nanoreviser_tpu.io import get_read_data, list_fast5_files
    from nanoreviser_tpu.signal.host_prep import prep_read

    fns = list_fast5_files(TRAIN_DIR)
    print(f"{len(fns)} reads")
    out = {}

    t0 = time.time()
    reads = [(fn, get_read_data(os.path.join(TRAIN_DIR, fn))) for fn in fns]
    out["decode_s"] = time.time() - t0
    print(f"decode: {out['decode_s']:.3f}s  "
          f"({out['decode_s']/len(fns)*1e3:.1f} ms/read)")

    t0 = time.time()
    prepped = [(fn, prep_read(rd)) for fn, rd in reads]
    out["prep_s"] = time.time() - t0
    print(f"prep: {out['prep_s']:.3f}s  ({out['prep_s']/len(fns)*1e3:.1f} ms/read)")

    with PrepPool(2) as pool:
        list(pool.stream(TRAIN_DIR, fns[:4]))      # warm the workers
        t0 = time.time()
        n_ok = sum(1 for _, p, e in pool.stream(TRAIN_DIR, fns) if e is None)
        out["pool_s"] = time.time() - t0
        assert n_ok == len(fns)
        print(f"pool decode+prep (2 proc): {out['pool_s']:.3f}s  "
              f"({len(fns)/out['pool_s']:.1f} reads/s)")

    engine = StreamingReviser(MODEL1, MODEL2)

    t0 = time.time()
    batches = []
    b = engine._new_batch()
    for (name, rd), (_, p) in zip(reads, prepped):
        if not engine._add_read(b, name, rd, p):
            engine._finalize(b)
            batches.append(b)
            b = engine._new_batch()
            assert engine._add_read(b, name, rd, p)
    if b.meta:
        engine._finalize(b)
        batches.append(b)
    out["assemble_s"] = time.time() - t0
    print(f"assemble: {out['assemble_s']:.3f}s  ({len(batches)} batches)")

    bufs = [{k: v[None] for k, v in bt.arrays.items()} for bt in batches]
    for _ in range(2):
        t0 = time.time()
        dev_bufs = [jax.device_put(bf, engine._buf_sharding) for bf in bufs]
        jax.block_until_ready(dev_bufs)
        out["h2d_s"] = time.time() - t0
    mb = sum(a.nbytes for bf in bufs for a in bf.values()) / 1e6
    print(f"h2d: {out['h2d_s']:.3f}s  ({mb:.1f} MB, {mb/out['h2d_s']:.0f} MB/s)")

    # device: k dispatches chained, ONE final fetch (axon's block_until_ready
    # returns at dispatch, so a fetch is the only true sync point)
    outs = [engine._fn(engine._ws, db) for db in dev_bufs]
    _ = [np.asarray(jax.tree_util.tree_leaves(o)[0]) for o in outs]
    t0 = time.time()
    outs = [engine._fn(engine._ws, db) for db in dev_bufs]
    host_outs = [np.asarray(jax.tree_util.tree_leaves(o)[0]) for o in outs]
    out["device_s"] = time.time() - t0
    print(f"device+d2h (warm): {out['device_s']:.3f}s  "
          f"({out['device_s']/len(batches)*1e3:.1f} ms/batch)")

    t = engine.window
    t0 = time.time()
    n_m = 0
    for bt, packed_all in zip(batches, host_outs):
        packed = packed_all[0]
        for name, rd, r0 in bt.meta:
            wr = max(rd.n_bases - t, 0)
            pk = packed[r0 : r0 + wr]
            y1 = (pk >> 3).astype(np.int32)
            y2 = (pk & 7).astype(np.int32)
            merge_revision(rd.bases, y1, y2, align=engine.align, window=t)
            n_m += 1
    out["merge_s"] = time.time() - t0
    print(f"merge: {out['merge_s']:.3f}s  ({out['merge_s']/n_m*1e3:.1f} ms/read)")

    for _ in range(2):
        t0 = time.time()
        errors = []
        n = sum(1 for _ in engine.revise_stream(iter(prepped), errors=errors))
        out["e2e_s"] = time.time() - t0
        assert not errors, errors[:2]
    print(f"e2e (pre-prepped): {out['e2e_s']:.3f}s  "
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
    print(f"e2e (PrepPool production): {out['e2e_pool_s']:.3f}s  "
          f"({len(fns)/out['e2e_pool_s']:.1f} reads/s)")

    out = {k: round(v, 3) for k, v in out.items()}
    out["n_batches"] = len(batches)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
