#!/usr/bin/env python
"""Fine-grained probe of revise_stream overhead: where does e2e - sum(stages) go?"""
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
    from nanoreviser_tpu.io import get_read_data, list_fast5_files
    from nanoreviser_tpu.infer.wire import encode_read
    from nanoreviser_tpu.signal.host_prep import compact_read

    fns = list_fast5_files(TRAIN_DIR)
    reads = [(fn, get_read_data(os.path.join(TRAIN_DIR, fn))) for fn in fns]
    prepped = [(fn, encode_read(compact_read(rd))) for fn, rd in reads]

    t0 = time.time()
    engine = StreamingReviser(MODEL1, MODEL2)
    print(f"engine init: {time.time()-t0:.2f}s")

    # monkeypatch timers around the interesting calls
    import nanoreviser_tpu.infer.streaming as S

    times = {"new_batch": 0.0, "add_read": 0.0, "finalize": 0.0,
             "device_put": 0.0, "fn": 0.0, "fetch_wait": 0.0, "finish_host": 0.0}

    orig_new = engine._new_batch
    def new_batch():
        t = time.time(); b = orig_new(); times["new_batch"] += time.time() - t
        return b
    engine._new_batch = new_batch

    orig_add = engine._add_read
    def add_read(b, n, r, p):
        t = time.time(); out = orig_add(b, n, r, p); times["add_read"] += time.time() - t
        return out
    engine._add_read = add_read

    orig_submit = engine._submit_group
    def submit_group(batches):
        metas = []
        t = time.time()
        for b in batches:
            engine._finalize(b)
            metas.append(b.meta)
        times["finalize"] += time.time() - t
        bufs = {k: v[None] for k, v in batches[0].arrays.items()}
        t = time.time()
        db = jax.device_put(bufs, engine._buf_sharding)
        times["device_put"] += time.time() - t
        t = time.time()
        out = engine._fn(engine._ws, db)
        times["fn"] += time.time() - t
        leaves = jax.tree_util.tree_leaves(out)

        def fetch():
            for leaf in leaves:
                leaf.copy_to_host_async()
            return [np.asarray(leaf) for leaf in leaves]

        return S._Pending(metas, engine._fetch_pool.submit(fetch))
    engine._submit_group = submit_group

    orig_finish = engine._finish
    def finish(p, emit="seq"):
        t = time.time()
        host = p.future.result()
        times["fetch_wait"] += time.time() - t
        t = time.time()
        p2 = S._Pending(p.meta, None)
        fut = type("F", (), {"result": staticmethod(lambda: host)})()
        p2.future = fut
        yield from orig_finish(p2, emit)
        times["finish_host"] += time.time() - t
    engine._finish = finish

    for it in range(3):
        for k in times:
            times[k] = 0.0
        t0 = time.time()
        errors = []
        n = sum(1 for _ in engine.revise_stream(iter(prepped), errors=errors))
        e2e = time.time() - t0
        assert not errors and n == len(fns)
        acc = sum(times.values())
        print(f"iter {it}: e2e={e2e:.3f}s accounted={acc:.3f}s "
              f"unaccounted={e2e-acc:.3f}s")
        for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
            print(f"   {k:12s} {v:.3f}s")


if __name__ == "__main__":
    main()
