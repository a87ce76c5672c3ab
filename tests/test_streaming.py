"""StreamingReviser (jnp fallback on CPU): batching semantics + host oracle.

The CPU fallback runs the SAME segmented device preprocessing
(device_preprocess_batch) and BN-folded model math as the TPU path, minus
the Pallas kernel — so these tests pin the whole batched pipeline against
an independent single-read host-side oracle (exact host segmentation +
jnp forward + merge).
"""

import dataclasses

import numpy as np
import pytest

from nanoreviser_tpu.io import get_read_data


def _truncate(rd, n):
    """First n bases with a consistently truncated signal tail and the
    decoder's 3/5 last-duration rule re-applied."""
    starts = rd.starts[:n]
    last_dur = 3.0 if (starts[-1] - starts[-2]) < 5 else 5.0
    lengths = np.concatenate([np.diff(starts).astype(np.float64), [last_dur]])
    sig_end = rd.read_start_rel_to_raw + int(starts[-1] + last_dur) + 40
    return dataclasses.replace(
        rd,
        starts=starts,
        lengths=lengths,
        bases=rd.bases[:n],
        ab_mean=rd.ab_mean[:n],
        ab_std=rd.ab_std[:n],
        signal=rd.signal[:sig_end],
    )


@pytest.fixture(scope="module")
def truncated_read(unitest_fast5_files):
    return _truncate(get_read_data(str(unitest_fast5_files[0])), 200)


@pytest.fixture(scope="module")
def small_streaming(ecoli_model_paths):
    import jax

    from nanoreviser_tpu.infer import StreamingReviser

    m1, m2 = ecoli_model_paths
    eng = StreamingReviser(
        str(m1), str(m2), batch_windows=1024, r_max=8,
        devices=jax.devices()[:1],
    )
    assert not eng._use_pallas  # CPU test exercises the jnp fallback
    return eng


def _host_oracle_seq(engine, read):
    """Independent per-read path: exact host segmentation -> jnp forward."""
    import jax.numpy as jnp

    from nanoreviser_tpu.infer.merge import merge_revision
    from nanoreviser_tpu.models.fused import (
        lstm_stack_apply,
        signal_branch_apply,
    )
    from nanoreviser_tpu.signal.features import assemble_features
    from nanoreviser_tpu.signal.segmentation import segment_signal

    t = engine.window
    tail = read.signal[read.read_start_rel_to_raw :]
    last_dur = int(read.lengths[-1])
    seg = segment_signal(tail, read.starts, last_dur)
    durations = np.concatenate([np.diff(read.starts), [last_dur]])
    feats = assemble_features(
        read.bases, seg.event_mean, seg.event_std, durations,
        read.ab_mean, read.ab_std, seg.shift, seg.scale,
    )
    n_windows = read.n_bases - t
    idx = np.arange(n_windows)[:, None] + np.arange(t)[None, :]
    sigw = jnp.asarray(seg.windows[idx])
    featw = jnp.asarray(feats[idx])
    l1 = lstm_stack_apply(
        engine._jnp1, featw, signal_branch_apply(engine._jnp1, sigw, engine.cfg)
    )
    l2 = lstm_stack_apply(
        engine._jnp2, featw, signal_branch_apply(engine._jnp2, sigw, engine.cfg)
    )
    y1 = np.asarray(jnp.argmax(l1, -1))
    y2 = np.asarray(jnp.argmax(l2, -1))
    from nanoreviser_tpu.infer.merge import calibrate_center_offset

    off, _ = calibrate_center_offset(read.bases, y1, t)
    return merge_revision(read.bases, y1, y2, align="center", window=t,
                          center_offset=off)


@pytest.mark.slow
def test_streaming_matches_host_oracle(small_streaming, truncated_read):
    seq = small_streaming.revise_read(truncated_read)
    expect = _host_oracle_seq(small_streaming, truncated_read)
    assert seq == expect
    # non-degeneracy: at the calibrated center the model tracks the read
    # closely (a collapsed model sits near the 0.25 base prior) and emits
    # more than one class; zero edits on a short mostly-correct read is fine
    from nanoreviser_tpu.infer.merge import calibrate_center_offset

    (_, _, y1l, _), = list(
        small_streaming.revise_stream([("", truncated_read)], emit="labels")
    )
    off, agree = calibrate_center_offset(
        truncated_read.bases, y1l, small_streaming.window
    )
    assert agree > 0.8, (off, agree)
    assert len(np.unique(np.asarray(y1l))) > 1


@pytest.mark.slow
def test_multi_read_batch_matches_single(
    small_streaming, unitest_fast5_files, truncated_read
):
    """Several reads packed into one buffer == each read alone."""
    reads = [
        ("a", _truncate(get_read_data(str(unitest_fast5_files[0])), 180)),
        ("b", _truncate(get_read_data(str(unitest_fast5_files[1])), 150)),
        ("c", truncated_read),
    ]
    batched = {
        name: seq
        for name, _, seq, _ in small_streaming.revise_stream(iter(reads))
    }
    for name, rd in reads:
        assert batched[name] == small_streaming.revise_read(rd), name


@pytest.mark.slow
def test_dp_sharded_batches_match_single_device(
    ecoli_model_paths, small_streaming, unitest_fast5_files, truncated_read
):
    """Two mesh devices, each revising its own batch slot: results must
    equal the 1-device engine, and the dispatch must actually shard."""
    import jax

    from nanoreviser_tpu.infer import StreamingReviser

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 (virtual) devices")
    m1, m2 = ecoli_model_paths
    eng = StreamingReviser(
        str(m1), str(m2), batch_windows=1024, r_max=2,
        devices=jax.devices()[:2],
    )
    assert eng.n_dev == 2
    # r_max=2 closes a batch every 2 reads -> 2 batch slots in one dispatch
    reads = [
        ("a", _truncate(get_read_data(str(unitest_fast5_files[0])), 180)),
        ("b", _truncate(get_read_data(str(unitest_fast5_files[1])), 150)),
        ("c", truncated_read),
        ("d", _truncate(get_read_data(str(unitest_fast5_files[2])), 160)),
    ]
    errors = []
    got = {n: s for n, _, s, _ in eng.revise_stream(iter(reads), errors=errors)}
    assert not errors
    for name, rd in reads:
        assert got[name] == small_streaming.revise_read(rd), name
    # the sharded buffer really spans both devices
    bufs = np.zeros((2, eng.n_rows, 50), np.int16)
    sharded = jax.device_put(bufs, eng._buf_sharding)
    assert len({s.device for s in sharded.addressable_shards}) == 2


@pytest.mark.slow
def test_streaming_emits_qualities(ecoli_model_paths, truncated_read):
    import jax

    from nanoreviser_tpu.infer import StreamingReviser

    m1, m2 = ecoli_model_paths
    eng = StreamingReviser(
        str(m1), str(m2), batch_windows=1024, r_max=8,
        emit_quality=True, devices=jax.devices()[:1],
    )
    [(name, _, seq, qual)] = list(eng.revise_stream([("r", truncated_read)]))
    assert qual is not None and len(qual) == len(seq)
    # phred-33 printable, capped at Q93
    assert all(33 <= ord(c) <= 126 for c in qual)
    # confident calls should dominate on real data
    q = np.frombuffer(qual.encode(), np.uint8) - 33
    assert np.median(q) > 10


@pytest.mark.slow
def test_streaming_error_degrades_to_passthrough(small_streaming, truncated_read):
    bad = dataclasses.replace(truncated_read, starts=np.zeros(0, np.int64))
    errors = []
    out = list(
        small_streaming.revise_stream(
            [("bad.fast5", bad), ("ok.fast5", truncated_read)], errors=errors
        )
    )
    assert [name for name, _, _, _ in out] == ["bad.fast5", "ok.fast5"]
    assert out[0][2] == bad.bases          # degraded to original bases
    assert len(errors) == 1 and errors[0][0] == "bad.fast5"
    assert out[1][2] == _host_oracle_seq(small_streaming, truncated_read)


@pytest.mark.slow
def test_short_reads_deferred_until_calibration(
    ecoli_model_paths, unitest_fast5_files, truncated_read, caplog
):
    """align='auto' must never merge a read with the uncalibrated default
    offset (round-4 advisor finding): short reads arriving before the first
    calibratable read are deferred and merged with the calibrated offset."""
    import logging

    import jax

    from nanoreviser_tpu.infer import StreamingReviser

    short = _truncate(get_read_data(str(unitest_fast5_files[1])), 40)
    m1, m2 = map(str, ecoli_model_paths)

    def fresh():
        return StreamingReviser(
            m1, m2, batch_windows=1024, r_max=8, devices=jax.devices()[:1]
        )

    # short read FIRST, calibrating read second: the short read's merge must
    # use the calibrated offset — identical to merging it on an engine that
    # calibrated beforehand
    eng = fresh()
    out = {n: s for n, _, s, _ in
           eng.revise_stream([("s", short), ("l", truncated_read)])}
    eng2 = fresh()
    eng2.revise_read(truncated_read)          # calibrate first
    assert eng._center_offset == eng2._center_offset
    assert out["s"] == eng2.revise_read(short)
    assert out["l"] == eng2.revise_read(truncated_read)

    # an entire stream of short reads: end-of-stream force-calibration with
    # a loud warning, still yielding every read
    eng3 = fresh()
    with caplog.at_level(logging.WARNING, logger="nanoreviser_tpu"):
        outs = list(eng3.revise_stream([("a", short), ("b", short)]))
    assert len(outs) == 2 and all(seq for _, _, seq, _ in outs)
    assert eng3._center_offset is not None
    assert any("calibration" in r.message for r in caplog.records)


def test_stall_heavy_read_admissible_in_small_tiers(
    ecoli_model_paths, unitest_fast5_files
):
    """Regression: unitest read ch13_read2251 (15.8 samples/base, 4.8%
    duration-escape rate) must fit the batch budgets of even a small-tier
    engine — its degradation in the CPU-default engine was a live bug."""
    import jax

    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.infer.wire import encode_read
    from nanoreviser_tpu.signal.host_prep import compact_read_numpy

    target = [p for p in unitest_fast5_files if "ch13_read2251" in p.name]
    assert target, "expected unitest read missing"
    rd = get_read_data(str(target[0]))
    w = encode_read(compact_read_numpy(rd))
    assert len(w.dur_esc_idx) > 0.03 * rd.n_bases  # still the skewed fixture
    m1, m2 = map(str, ecoli_model_paths)
    eng = StreamingReviser(
        m1, m2, batch_windows=16384, r_max=8, devices=jax.devices()[:1]
    )
    batch = eng._new_batch()
    assert eng._add_read(batch, "r", rd, w), (
        "stall-heavy read rejected by batch escape budgets")


@pytest.mark.slow
def test_escape_budget_flush_keeps_outputs_correct(ecoli_model_paths):
    """Several escape-heavy reads exhaust a small tier's signal-escape
    budget mid-batch; the engine must flush early and keep every read's
    output identical to its solo run (no degradation, no cross-batch
    corruption)."""
    import jax

    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.infer.wire import encode_read
    from nanoreviser_tpu.signal.host_prep import CompactRead

    rng = np.random.default_rng(3)

    def noisy_read(seed, n=220):
        r = np.random.default_rng(seed)
        # random-walk signal with frequent > 127 jumps -> dense sig escapes;
        # signal ends exactly at the last window (boundary-delta proof)
        m = (n - 1) * 9 + 50
        sig = np.cumsum(r.integers(-300, 300, m)).clip(-30000, 30000)
        pos0 = np.arange(n, dtype=np.int32) * 9
        feats = np.zeros((n, 6), np.float16)
        feats[:, 3] = np.float16(np.float64(9) * 0.1)
        feats[n - 1, 3] = np.float16(0.3)
        bases = "".join(r.choice(list("ACGT"), n))
        return CompactRead(
            bases=bases, csig=sig.astype(np.int16), pos0=pos0,
            vlen=np.full(n, 50, np.uint8), feats=feats,
            shift=450.0, scale=30.0,
        )

    reads = [(f"s{k}", noisy_read(k)) for k in range(8)]
    m1, m2 = map(str, ecoli_model_paths)
    eng = StreamingReviser(
        m1, m2, batch_windows=4096, r_max=16, devices=jax.devices()[:1]
    )
    per_read = len(encode_read(reads[0][1]).sig_esc_idx)
    assert per_read * len(reads) > eng.top.e_cap, (
        "fixture no longer exercises the escape budget")
    errors: list = []
    got = {n: s for n, _, s, _ in eng.revise_stream(iter(reads), errors=errors)}
    assert not errors, errors[:2]
    assert len(got) == len(reads)
    for name, c in reads:
        (_, _, solo, _), = list(eng.revise_stream(iter([(name, c)])))
        assert got[name] == solo, name


@pytest.mark.slow
def test_extreme_chain_delta_between_reads(ecoli_model_paths):
    """Two reads whose adjacent endpoints differ by ~40000 (legal int16 DAC
    values) must batch identically to their solo runs — the inter-read
    chain delta needs int32 end to end (code-review round-5 finding)."""
    import jax

    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.signal.host_prep import CompactRead

    def flat_read(level, n=120):
        sig = np.full(n * 9 + 50, level, np.int16)
        pos0 = np.arange(n, dtype=np.int32) * 9
        feats = np.zeros((n, 6), np.float16)
        feats[:, 3] = np.float16(np.float64(9) * 0.1)
        feats[n - 1, 3] = np.float16(0.3)
        return CompactRead(
            bases="ACGT" * (n // 4), csig=sig, pos0=pos0,
            vlen=np.full(n, 50, np.uint8), feats=feats,
            shift=450.0, scale=30.0,
        )

    a, b = flat_read(-20000), flat_read(20000)
    m1, m2 = map(str, ecoli_model_paths)
    eng = StreamingReviser(
        m1, m2, batch_windows=1024, r_max=8, devices=jax.devices()[:1]
    )
    errors: list = []
    got = {n: s for n, _, s, _ in
           eng.revise_stream([("a", a), ("b", b)], errors=errors)}
    assert not errors, errors[:2]
    for name, c in (("a", a), ("b", b)):
        (_, _, solo, _), = list(eng.revise_stream(iter([(name, c)])))
        assert got[name] == solo, name


@pytest.mark.slow
def test_abandoned_stream_does_not_leak_deferred_reads(
    ecoli_model_paths, unitest_fast5_files, truncated_read
):
    """A consumer that abandons a revise_stream generator before its
    end-of-stream flush must not leak deferred pre-calibration reads into a
    later stream's output (code-review round-5 finding). r_max=1 +
    max_in_flight=0 force a mid-stream drain that DEFERS the first short
    read; the bad read then produces the stream's first yield while the
    stash is non-empty, which is where we abandon."""
    import dataclasses as dc
    import itertools

    import jax

    from nanoreviser_tpu.infer import StreamingReviser

    short = _truncate(get_read_data(str(unitest_fast5_files[1])), 40)
    bad = dc.replace(short, starts=np.zeros(0, np.int64))
    m1, m2 = map(str, ecoli_model_paths)
    eng = StreamingReviser(
        m1, m2, batch_windows=1024, r_max=1, max_in_flight=0,
        devices=jax.devices()[:1],
    )
    gen = eng.revise_stream(
        [("stale0", short), ("stale1", short), ("bad", bad)])
    abandoned = list(itertools.islice(gen, 1))
    assert abandoned[0][0] == "bad"        # shorts are stashed, not yielded
    gen.close()
    assert eng._center_offset is None      # stream never calibrated
    out = list(eng.revise_stream([("fresh", truncated_read)]))
    assert [name for name, _, _, _ in out] == ["fresh"]
    assert out[0][2] == eng.revise_read(truncated_read)


def test_stale_shm_slot_gc(tmp_path):
    """PrepPool startup reclaims slots left by dead processes (kill -9 /
    OOM before close()); live processes' slots are untouched."""
    import nanoreviser_tpu.infer.hostpipe as hp

    import subprocess
    import sys as _sys

    # a PID guaranteed dead: spawn and reap a child (hardcoding a "large"
    # PID flakes on hosts with pid_max above it)
    child = subprocess.Popen([_sys.executable, "-c", "pass"])
    child.wait()
    dead = f"/dev/shm/nanorev_prep_{child.pid}_0_0"
    live = f"/dev/shm/nanorev_prep_{__import__('os').getpid()}_999_0"
    open(dead, "wb").close()
    open(live, "wb").close()
    try:
        hp._gc_stale_slots()
        import os
        assert not os.path.exists(dead)
        assert os.path.exists(live)
    finally:
        import os
        for p in (dead, live):
            try:
                os.unlink(p)
            except OSError:
                pass


@pytest.mark.slow
def test_bad_trailing_read_does_not_poison_stream(
    small_streaming, truncated_read
):
    """A read with trailing signal past its last window degrades ITSELF at
    encode time; reads packed after it revise normally (round-5 review: the
    old boundary guard fired on the NEXT read and degraded the rest of the
    stream)."""
    from nanoreviser_tpu.signal.host_prep import CompactRead, compact_read

    good = compact_read(truncated_read)
    bad = CompactRead(
        bases=good.bases,
        csig=np.concatenate([good.csig, np.zeros(300, np.int16)]),
        pos0=good.pos0, vlen=good.vlen, feats=good.feats,
        shift=good.shift, scale=good.scale,
    )
    errors: list = []
    out = {n: s for n, _, s, _ in small_streaming.revise_stream(
        [("bad", bad), ("g1", good), ("g2", good)], errors=errors)}
    assert [n for n, _ in errors] == ["bad"]
    assert "slack" in str(errors[0][1])
    assert out["bad"] == bad.bases                      # degraded
    solo = small_streaming.revise_read(truncated_read)
    assert out["g1"] == solo and out["g2"] == solo      # unpoisoned
