"""Streaming TPU inference engine — megabatched production fast path.

Pipeline shape, designed around the measured profile of the TPU attachment
(true h2d ~60 MB/s with ~25 ms RTT per host-blocking call; the tunnel is the
binding constraint, NOT the chip) and of the chip (fused dual-model kernel
~50 ms + window-gather kernel ~9 ms per 393k-window batch):

  host worker(s):   fast5 decode + per-read COMPACTION (signal/host_prep:
                    window-interval union of the raw int16 signal, exact f64
                    event moments, f16 feature rows) + WIRE ENCODE
                    (infer.wire: zig-zag signal deltas, pos deltas, escape
                    lists — C++ fast path) on worker processes
                    (infer.hostpipe) or the caller's threads
  batch assembly:   MANY reads concatenated into ONE fixed-shape wire buffer
                    (~22 B/base vs ~50 in round 4 and 121 when windows were
                    host-gathered; the upload is what the 26-66 MB/s tunnel
                    actually moves, so bytes/base is the headline number)
  upload:           one contiguous h2d per batch (async)
  device (1 jit):   infer.wire.decode_wire (XLA: scatter+cumsum exact signal
                    reconstruction, block-meta math, f16-table feature
                    derivation) -> ops.window_gather Pallas kernel
                    (reversed-Toeplitz roll + exact one-hot MXU gather +
                    fused normalize/mask; bit-identical to the old
                    host-gather path) -> fused dual-model Pallas kernel
                    (ops/reviser_kernel.stack_logits_full) -> packed uint8
                    labels (y1*8+y2) [+ phred qualities]
  download:         one async d2h per batch on a fetch thread (~25 ms RTT is
                    amortized over the whole batch and overlaps compute)
  host:             vectorized per-read revision merge + fasta/fastq write

Fixed-shape SIZE TIERS: a 5-read directory must not pay a 393k-row buffer's
upload (the round-3 unitest latency was 10.5 reads/s for exactly this
reason). The engine compiles one program per tier lazily and submits each
batch at the smallest tier that fits, so small inputs ride a ~16x smaller
upload and kernel.

The reference's only parallelism is a per-read multiprocessing.Pool
(NanoReviser.py:203-223); here a single device pipeline sustains hundreds of
reads/s and the host workers only decode, compact, and write.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..io.fast5 import ReadData
from ..models import load_keras_weights
from ..models.fused import fold_inference_params
from ..models.reviser import ReviserConfig
from ..ops.reviser_kernel import (
    GP,
    pack_stack_weights,
    stack_logits_full,
    stack_weight_dicts,
)
from ..ops.window_gather import (
    ALIGN,
    DMA_LEN,
    R_CAP,
    pack_read_tables,
    window_gather_tpu,
    window_gather_xla_f32,
)
from ..ops.window_gather import BLK as GBLK
from ..signal.host_prep import CompactRead, compact_read
from .merge import (
    calibrate_center_offset,
    merge_revision,
    merge_revision_with_quality,
)
from .wire import (
    DROP,
    MAX_BOUNDARY_DELTA,
    WireRead,
    decode_wire,
    encode_read,
    pack_codes2,
)

DEFAULT_BLOCK = 256
DEFAULT_BATCH_WINDOWS = 196608      # windows per device batch (~20 reads).
                                    # Measured on the tunnel-attached chip:
                                    # half-size batches start their uploads
                                    # earlier and waste less tail padding,
                                    # beating 393216 by ~19% e2e (127 vs
                                    # 107 reads/s over the 100-read set)
DEFAULT_R_MAX = 144                 # max reads per batch
SAMPLES_PER_ROW = 11                # signal budget per base row (avg ~9.9;
                                    # batches fill their row budget first, so
                                    # the tighter cap only rarely forces an
                                    # early flush, and it cuts 1 B/row off
                                    # the link-bound upload)
SIG_HEAD = 64                       # slack before the first read's signal
VE_CAP = 4096                       # vlen-escape rows per batch (~5/read)
CE_CAP = 1024                       # non-ACGT color-escape rows per batch


def _enable_compile_cache():
    cache_dir = os.environ.get(
        "NANOREV_JAX_CACHE", os.path.expanduser("~/.cache/nanorev_jax")
    )
    if cache_dir in ("0", ""):
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass(frozen=True)
class _Tier:
    """One fixed compiled batch geometry."""

    w_max: int          # windows
    n_rows: int         # base rows the model consumes (w_max + window)
    n_rows_g: int       # gather rows (n_rows rounded up to the gather block)
    s_cap: int          # signal samples in the (u8 delta-coded) buffer
    e_cap: int          # signal-escape entries (~1% of samples; avg 0.86%)
    de_cap: int         # duration-escape rows (~3%/row cap; avg ~1%)


@dataclass
class _Batch:
    arrays: dict                               # host-side packing arrays
    meta: list = field(default_factory=list)   # (fast5_name, read_obj, row_off)
    shifts: list = field(default_factory=list)   # per-read normalizers, in
    scales: list = field(default_factory=list)   # read_id order
    rows: int = 0
    sig_used: int = SIG_HEAD                   # cursor in FORWARD sample space
    nse: int = 0                               # signal-escape entries used
    nve: int = 0                               # vlen-escape entries used
    nde: int = 0                               # duration-escape entries used
    nce: int = 0                               # color-escape entries used
    prev_last_val: int = 0                     # last signal value (delta chain)
    last_pos: int = 0                          # abs pos0 of the last row added


@dataclass
class _Pending:
    meta: list
    future: cf.Future                          # resolves to fetched np arrays


class StreamingReviser:
    """Revises a stream of reads with deep host/device pipelining."""

    def __init__(
        self,
        model1_path: str,
        model2_path: str,
        *,
        block: int = DEFAULT_BLOCK,
        align: str = "auto",
        batch_windows: int | None = None,
        r_max: int = DEFAULT_R_MAX,
        emit_quality: bool = False,
        max_in_flight: int = 4,
        use_pallas: bool | None = None,
        devices: list | None = None,
    ):
        _enable_compile_cache()
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if batch_windows is None:
            # the jnp fallback (CPU tests / chipless hosts) gathers
            # [W, T, 50] windows — keep its fixed batch small
            batch_windows = DEFAULT_BATCH_WINDOWS if use_pallas else 16384
        p1, win1, nc1 = load_keras_weights(model1_path)
        p2, win2, nc2 = load_keras_weights(model2_path)
        if win1 != win2:
            raise ValueError(f"model window mismatch: {win1} vs {win2}")
        self.window = win1
        self.n_classes = (nc1, nc2)
        self.block = block
        self.align = align
        # "auto": the window-center offset is a property of the WEIGHTS
        # (ours encode (window-1)//2; the reference's shipped weights encode
        # one less — an off-by-one in its never-run inference wiring), so it
        # is calibrated empirically from the first revised read
        # (merge.calibrate_center_offset).
        self._center_offset: int | None = (
            None if align == "auto" else (win1 - 1) // 2)
        self.emit_quality = emit_quality
        self.max_in_flight = max_in_flight
        self.cfg = ReviserConfig(window=win1, n_classes=nc1)

        assert batch_windows % block == 0
        if r_max > R_CAP:
            raise ValueError(
                f"r_max={r_max} exceeds the gather kernel's per-batch read "
                f"table capacity R_CAP={R_CAP} (read ids are packed into 8 "
                f"bits of the block meta)")
        self.w_max = batch_windows
        self.r_max = r_max
        self._use_pallas = use_pallas

        # size tiers: 1/8, 1/4, 1/2, full. Small directories and tail
        # batches ride a smaller program so they do not pay the full
        # fixed-shape upload over the ~50 MB/s tunnel (the 5-read unitest
        # fits the 1/8 tier; the last partial batch of a big run usually
        # fits 1/2). Programs compile lazily per tier.
        tiers_w = [batch_windows]
        if use_pallas:
            for div in (2, 4, 8):
                w = _round_up(batch_windows // div, block)
                if block <= w < tiers_w[0]:
                    tiers_w.insert(0, w)
        self.tiers = [self._mk_tier(w) for w in tiers_w]
        self.top = self.tiers[-1]
        self.n_rows = self.top.n_rows

        f1 = fold_inference_params(p1)
        f2 = fold_inference_params(p2)

        from jax.sharding import PartitionSpec as P  # noqa: F401

        from ..parallel import batch_sharding, make_mesh, replicated_sharding

        if devices is None:
            devices = jax.local_devices()
        self.mesh = make_mesh(devices)
        self.n_dev = len(devices)
        self._rep = replicated_sharding(self.mesh)
        self._buf_sharding = batch_sharding(self.mesh)

        ws = stack_weight_dicts(
            [pack_stack_weights(f1, win1), pack_stack_weights(f2, win2)]
        )
        self._ws = jax.device_put(ws, self._rep)
        if not self._use_pallas:
            lstm_keys = (
                "read_rnn1", "read_rnn2", "total_rnn1", "total_rnn2",
                "dense1", "dense2", "main_out", "feature", "final_out",
            )
            conv_keys = ("conv1", "bn_c1", "conv2", "bn_c2", "sig_dense")
            self._jnp1 = jax.device_put(
                {k: f1[k] for k in lstm_keys + conv_keys}, self._rep
            )
            self._jnp2 = jax.device_put(
                {k: f2[k] for k in lstm_keys + conv_keys}, self._rep
            )

        self._fns: dict = {}          # tier -> jitted sharded program (lazy)
        # ONE upload thread: device_put over the tunnel blocks for the
        # transfer duration, so it must not run on the packing thread —
        # batch k+1 packs (and the PrepPool decodes) while k uploads.
        # Single-threaded keeps submission order.
        self._upload_pool = cf.ThreadPoolExecutor(max_workers=1)
        # two fetch threads: the d2h of batch k overlaps the RTT of k+1
        self._fetch_pool = cf.ThreadPoolExecutor(max_workers=2)

    def _mk_tier(self, w: int) -> _Tier:
        n_rows = w + self.window
        n_rows_g = _round_up(n_rows, GBLK)
        s_cap = _round_up(
            n_rows_g * SAMPLES_PER_ROW + DMA_LEN + SIG_HEAD + 64, ALIGN)
        # escape capacities: fleet-average rates are ~0.9% of samples /
        # ~1% of rows, but a SINGLE stall-heavy read can run ~5% duration
        # escapes (unitest read ch13_read2251: 4.8%) — the floors keep one
        # skewed read admissible even in the smallest tier, where the extra
        # bytes are immaterial
        return _Tier(w_max=w, n_rows=n_rows, n_rows_g=n_rows_g, s_cap=s_cap,
                     e_cap=max(s_cap // 96, 8192),
                     de_cap=max(n_rows_g // 32, 4096))

    # ----------------------------------------------------------- device side

    def _get_fn(self, tier: _Tier):
        """Compile (lazily, per tier) the sharded device program."""
        fn = self._fns.get(tier)
        if fn is not None:
            return fn
        from jax.sharding import PartitionSpec as P

        def device_fn(ws, v):
            return self._device_fn(ws, v, tier)

        def sharded_fn(ws, bufs):           # local shard: dict of [1, ...]
            out = device_fn(
                ws, jax.tree_util.tree_map(lambda x: x[0], bufs)
            )
            return jax.tree_util.tree_map(lambda x: x[None], out)

        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover — older jax
            from jax.experimental.shard_map import shard_map

        # check_vma must be off: pallas_call outputs carry no varying-manual-
        # axes annotation, which the checker (jax >= 0.8) rejects outright
        try:
            smapped = shard_map(
                sharded_fn, mesh=self.mesh,
                in_specs=(P(), P("dp")), out_specs=P("dp"),
                check_vma=False,
            )
        except TypeError:  # pragma: no cover — older jax spells it check_rep
            smapped = shard_map(
                sharded_fn, mesh=self.mesh,
                in_specs=(P(), P("dp")), out_specs=P("dp"),
                check_rep=False,
            )
        fn = jax.jit(smapped)
        self._fns[tier] = fn
        return fn

    def _device_fn(self, ws, v, tier: _Tier):
        t = self.window
        # wire decode (pure XLA, fused into this jit): u8 delta stream ->
        # reversed int16 signal, u8 pos deltas -> block meta, f16 tables ->
        # the 2 derived feature columns (infer.wire)
        sigr, csr, rr, meta, feats_f32 = decode_wire(
            v, s_cap=tier.s_cap, n_rows=tier.n_rows, n_rows_g=tier.n_rows_g)
        if self._use_pallas:
            sig_nb = window_gather_tpu(
                sigr, csr, rr, v["nv"], meta, v["tabs"],
                n_rows=tier.n_rows_g,
            )[: tier.n_rows]
            feats_nb = jnp.pad(
                feats_f32, ((0, 0), (0, GP - feats_f32.shape[1]))
            ).astype(jnp.bfloat16)
            out = stack_logits_full(
                ws, sig_nb, feats_nb,
                t_len=t, block=self.block,
                want_probs=self.emit_quality,
                w_valid=v["wvalid"][0],
            )
            if self.emit_quality:
                logits, probs = out
            else:
                logits, probs = out, None
            l1, l2 = logits[0], logits[1]
        else:
            from ..models.fused import lstm_stack_apply, signal_branch_apply

            windows = window_gather_xla_f32(
                sigr, csr, rr, v["nv"], meta, v["tabs"],
                n_rows=tier.n_rows_g,
            )[: tier.n_rows]
            feats = feats_f32
            n_windows = tier.w_max
            idx = jnp.arange(n_windows)[:, None] + jnp.arange(t)[None, :]
            sigw = windows[idx]                    # [W, T, 50]
            featw = feats[idx]                     # [W, T, 6]
            l1 = lstm_stack_apply(
                self._jnp1, featw, signal_branch_apply(self._jnp1, sigw, self.cfg)
            )
            l2 = lstm_stack_apply(
                self._jnp2, featw, signal_branch_apply(self._jnp2, sigw, self.cfg)
            )
            if self.emit_quality:
                probs = jnp.stack([
                    jnp.max(jax.nn.softmax(l1.astype(jnp.float32), -1), -1),
                    jnp.max(jax.nn.softmax(l2.astype(jnp.float32), -1), -1),
                ])
            else:
                probs = None

        y1 = jnp.argmax(l1, axis=-1).astype(jnp.uint8)
        y2 = jnp.argmax(l2, axis=-1).astype(jnp.uint8)
        packed = y1 * np.uint8(8) + y2
        if probs is None:
            return packed
        # phred-scaled confidence of the argmax class, capped at Q40
        err = jnp.clip(1.0 - probs, 1e-4, 1.0)
        q = jnp.clip(-10.0 * jnp.log10(err), 0.0, 93.0).astype(jnp.uint8)
        return packed, q

    # ------------------------------------------------------------- host side

    def _new_batch(self) -> _Batch:
        """Host packing arrays, allocated at the TOP tier (submit slices)."""
        top = self.top
        return _Batch(arrays={
            "sig8": np.zeros(top.s_cap, np.uint8),
            "sig_esc_idx": np.full(top.e_cap, DROP, np.int32),
            "sig_esc_delta": np.zeros(top.e_cap, np.int32),
            "posd": np.zeros(top.n_rows_g, np.uint8),
            "vlen_esc_idx": np.full(VE_CAP, DROP, np.int32),
            "vlen_esc_val": np.zeros(VE_CAP, np.int32),
            "dur_esc_idx": np.full(top.de_cap, DROP, np.int32),
            "dur_esc_f32": np.zeros(top.de_cap, np.float32),
            "col_esc_idx": np.full(CE_CAP, DROP, np.int32),
            "codes": np.zeros(top.n_rows_g, np.uint8),
            "evf": np.zeros((top.n_rows, 4), np.float16),
            "read_r0": np.full(R_CAP, DROP, np.int32),
        })

    def _add_read(self, batch: _Batch, name: str, read, w: WireRead) -> bool:
        """Try to append a wire-encoded read to the batch; False if it won't
        fit (rows, signal, read-table, or any escape budget).

        ``read`` is the caller's original object (ReadData, CompactRead or
        WireRead), carried through to the output tuples; ``w`` holds the
        encoded arrays.
        """
        n = w.n_bases
        m = w.n_samples
        top = self.top
        sig_limit = top.s_cap - DMA_LEN - 64
        if (batch.rows + n > top.n_rows
                or batch.sig_used + m > sig_limit
                or len(batch.meta) >= self.r_max
                or batch.nse + len(w.sig_esc_idx) + 1 > top.e_cap
                or batch.nde + len(w.dur_esc_idx) > top.de_cap
                or batch.nve + len(w.vlen_esc_idx) > VE_CAP
                or batch.nce + len(w.col_esc_idx) > CE_CAP):
            return False
        vw = batch.arrays
        r0 = batch.rows
        g = batch.sig_used
        # the first row's pos0 delta chains from the previous read's last
        # row (or from 0 at the head). encode-time chain-bounds validation
        # (infer.wire.validate_chain_bounds) guarantees every adjacency of
        # VALID reads lands in [0, MAX_BOUNDARY_DELTA], so this is a
        # should-never-fire backstop for the block-span proof — if it does
        # fire, the current read degrades and the batch is untouched
        row_delta = (g + w.pos0_first) - (batch.last_pos if r0 else 0)
        if not 0 <= row_delta <= MAX_BOUNDARY_DELTA:
            raise ValueError(
                f"read-boundary pos0 delta {row_delta} outside "
                f"[0, {MAX_BOUNDARY_DELTA}] — block span budget unprovable "
                f"(chain-bounds validation should have caught this)")
        # forward placement: sample p of the batch lives at sig8[p]
        vw["sig8"][g : g + m] = w.sig8
        e0 = batch.nse
        ne = len(w.sig_esc_idx)
        vw["sig_esc_idx"][e0] = g                   # chained first delta
        vw["sig_esc_delta"][e0] = w.first_val - batch.prev_last_val
        vw["sig_esc_idx"][e0 + 1 : e0 + 1 + ne] = g + w.sig_esc_idx
        vw["sig_esc_delta"][e0 + 1 : e0 + 1 + ne] = w.sig_esc_delta
        batch.nse = e0 + 1 + ne
        vw["posd"][r0] = row_delta
        vw["posd"][r0 + 1 : r0 + n] = w.posd[1:]
        nv_ = len(w.vlen_esc_idx)
        vw["vlen_esc_idx"][batch.nve : batch.nve + nv_] = r0 + w.vlen_esc_idx
        vw["vlen_esc_val"][batch.nve : batch.nve + nv_] = w.vlen_esc_val
        batch.nve += nv_
        nd = len(w.dur_esc_idx)
        vw["dur_esc_idx"][batch.nde : batch.nde + nd] = r0 + w.dur_esc_idx
        vw["dur_esc_f32"][batch.nde : batch.nde + nd] = w.dur_esc_f32
        batch.nde += nd
        nc = len(w.col_esc_idx)
        vw["col_esc_idx"][batch.nce : batch.nce + nc] = r0 + w.col_esc_idx
        batch.nce += nc
        vw["codes"][r0 : r0 + n] = w.codes
        vw["evf"][r0 : r0 + n] = w.evf
        vw["read_r0"][len(batch.meta)] = r0
        batch.shifts.append(w.shift)
        batch.scales.append(w.scale)
        batch.meta.append((name, read, r0))
        batch.rows = r0 + n
        batch.sig_used = g + m
        batch.prev_last_val = w.last_val
        batch.last_pos = g + w.pos0_last
        return True

    def _pick_tier(self, batches: list[_Batch]) -> _Tier:
        rows = max(b.rows for b in batches)
        sig = max(b.sig_used for b in batches)
        nse = max(b.nse for b in batches)
        nde = max(b.nde for b in batches)
        for tier in self.tiers:
            if (rows <= tier.n_rows and sig <= tier.s_cap - DMA_LEN - 64
                    and nse <= tier.e_cap and nde <= tier.de_cap):
                return tier
        return self.top

    def _finalize(self, batch: _Batch, tier: _Tier) -> dict:
        """Slice one batch's host arrays into tier-shaped upload arrays.

        Pad rows need no special handling: their posd is 0, so the decoded
        pos0 repeats the last real row (keeping pad blocks' DMA span sane),
        and their vlen defaults to 50 / read_id to the last read — those rows
        feed only windows past w_valid, which the kernel skips or the host
        never reads.
        """
        vw = batch.arrays
        rows = batch.rows
        tabs = pack_read_tables(batch.shifts, batch.scales)
        w_needed = max(rows - self.window, 0)
        w_valid = min(-(-w_needed // self.block) * self.block, tier.w_max)
        if w_valid:
            nv = -(-(min(w_valid + self.window, tier.n_rows_g)) // GBLK)
        else:
            nv = 0
        return {
            "sig8": vw["sig8"][: tier.s_cap],
            "sig_esc_idx": vw["sig_esc_idx"][: tier.e_cap],
            "sig_esc_delta": vw["sig_esc_delta"][: tier.e_cap],
            "posd": vw["posd"][: tier.n_rows_g],
            "vlen_esc_idx": vw["vlen_esc_idx"],
            "vlen_esc_val": vw["vlen_esc_val"],
            "dur_esc_idx": vw["dur_esc_idx"][: tier.de_cap],
            "dur_esc_f32": vw["dur_esc_f32"][: tier.de_cap],
            "col_esc_idx": vw["col_esc_idx"],
            "codes2": pack_codes2(vw["codes"][: tier.n_rows_g]),
            "evf": vw["evf"][: tier.n_rows],
            "read_r0": vw["read_r0"],
            "tabs": tabs,
            "nv": np.array([nv], np.int32),
            "wvalid": np.array([w_valid], np.int32),
        }

    def _submit_group(self, batches: list[_Batch]) -> _Pending:
        """One sharded dispatch: batch slot d runs on mesh device d."""
        tier = self._pick_tier(batches)
        metas = [b.meta for b in batches]
        packed = [self._finalize(b, tier) for b in batches]
        if self.n_dev == 1 and len(batches) == 1:
            bufs = {k: v[None] for k, v in packed[0].items()}
        else:
            pads = [self._finalize(self._new_batch(), tier)
                    for _ in range(self.n_dev - len(batches))]
            group = packed + pads
            bufs = {
                k: np.stack([p[k] for p in group]) for k in packed[0]
            }
        fn = self._get_fn(tier)

        def upload_dispatch():
            out = fn(self._ws, jax.device_put(bufs, self._buf_sharding))
            return jax.tree_util.tree_leaves(out)

        up = self._upload_pool.submit(upload_dispatch)

        def fetch():
            leaves = up.result()
            for leaf in leaves:
                leaf.copy_to_host_async()
            return [np.asarray(leaf) for leaf in leaves]

        return _Pending(metas, self._fetch_pool.submit(fetch))

    def _merge_mode(self) -> str:
        return "reference" if self.align == "reference" else "center"

    def _calibrate(self, bases: str, y1: np.ndarray) -> None:
        """Lazy per-weights center-offset calibration (align="auto")."""
        off, agree = calibrate_center_offset(bases, y1, self.window)
        self._center_offset = off
        import logging

        logging.getLogger("nanoreviser_tpu").info(
            "center offset calibrated: %d (model1 agreement %.3f)",
            off, agree,
        )
        if agree < 0.5:
            logging.getLogger("nanoreviser_tpu").warning(
                "center-offset calibration found no confident alignment "
                "(best agreement %.3f) — model may be degenerate; using "
                "the default center %d", agree, off,
            )

    def _merge_one(self, name, read, y1, y2, q1, q2):
        t = self.window
        if q1 is not None:
            seq, qual = merge_revision_with_quality(
                read.bases, y1, y2, q1, q2,
                align=self._merge_mode(), window=t,
                center_offset=self._center_offset,
            )
            return name, read, seq, qual
        seq = merge_revision(
            read.bases, y1, y2, align=self._merge_mode(),
            window=t, center_offset=self._center_offset,
        )
        return name, read, seq, None

    def _flush_precal(self, precal: list):
        """Merge + yield reads deferred while the center offset was unknown."""
        stash, precal[:] = list(precal), []
        for item in stash:
            yield self._merge_one(*item)

    def _finish(self, pending: _Pending, emit: str = "seq",
                precal: list | None = None):
        host = pending.future.result()
        packed_all = host[0]                           # [D, W]
        q_all = host[1] if len(host) > 1 else None     # [D, 2, W]
        t = self.window
        for slot, meta in enumerate(pending.meta):
            packed = packed_all[slot]
            q = q_all[slot] if q_all is not None else None
            for name, read, r0 in meta:
                wr = max(read.n_bases - t, 0)
                if wr == 0:
                    yield (name, read, None, None) if emit == "labels" else (
                        name, read, read.bases, None
                    )
                    continue
                pk = packed[r0 : r0 + wr]
                y1 = (pk >> 3).astype(np.int32)
                y2 = (pk & 7).astype(np.int32)
                if emit == "labels":
                    yield name, read, y1, y2
                    continue
                q1 = q[0, r0 : r0 + wr] if q is not None else None
                q2 = q[1, r0 : r0 + wr] if q is not None else None
                if self._center_offset is None:
                    if wr >= 64:
                        self._calibrate(read.bases, y1)
                        if precal is not None:
                            yield from self._flush_precal(precal)
                    else:
                        if precal is None:
                            # a deferred read with nowhere to go would
                            # silently vanish from the output — only
                            # revise_stream (which owns a stream-local
                            # stash) may take the deferral branch
                            raise RuntimeError(
                                "pre-calibration deferral requires a "
                                "stream-local stash (call _finish with "
                                "precal=[...])")
                        # too short to calibrate confidently — defer the
                        # merge until an offset is established (or the
                        # stream ends: revise_stream force-calibrates).
                        # The stash is STREAM-local (passed in by
                        # revise_stream): an abandoned generator must not
                        # leak deferred reads into a later stream's output
                        precal.append((name, read, y1, y2, q1, q2))
                        continue
                yield self._merge_one(name, read, y1, y2, q1, q2)

    def revise_stream(self, items, errors: list | None = None,
                      emit: str = "seq"):
        """items: iterable of (fast5_name, ReadData | CompactRead | WireRead).

        WireRead items (from infer.hostpipe worker processes) are packed
        directly; CompactRead / ReadData items are wire-encoded (and, for
        ReadData, compacted first) inline on the calling thread.

        Yields (name, read, revised_seq, qual_or_None) in input order
        (deterministic caveats: degraded reads are emitted at input time,
        ahead of in-flight successful reads, and with align="auto" reads too
        short to calibrate the center offset are deferred until calibration);
        with emit="labels" yields (name, read, y1, y2) raw per-window class
        labels instead (accuracy tooling; degraded reads yield y1 = y2 = None).

        Reads are packed into fixed-shape device batches; up to
        ``max_in_flight`` batches overlap decode, h2d, compute, and the
        d2h fetch (which runs on a dedicated thread).

        Per-read failures degrade to the original bases (the reference's
        fallback contract, NanoReviser.py:146-154); pass ``errors`` to also
        collect (name, exception) pairs.
        """
        pending: collections.deque[_Pending] = collections.deque()
        ready: list[_Batch] = []
        batch = self._new_batch()
        precal: list = []          # stream-local pre-calibration stash

        def submit_ready(force: bool):
            if not ready or (len(ready) < self.n_dev and not force):
                return
            group, ready[:] = ready[:], []
            try:
                pending.append(self._submit_group(group))
            except Exception as exc:  # noqa: BLE001 — whole-group degradation
                metas = [b.meta for b in group]
                for meta in metas:
                    for name, read, _ in meta:
                        if errors is not None:
                            errors.append((name, exc))
                done = cf.Future()
                done.set_result(None)
                p = _Pending(metas, done)
                p.degraded = exc
                pending.append(p)

        def flush(force: bool = False):
            nonlocal batch
            if batch.meta:
                ready.append(batch)
                batch = self._new_batch()
            submit_ready(force)

        def fallback(read):
            return (None, None) if emit == "labels" else (read.bases, None)

        def drain(p: _Pending):
            if getattr(p, "degraded", None) is not None:
                for meta in p.meta:
                    for name, read, _ in meta:
                        yield (name, read) + fallback(read)
                return
            n_stashed = len(precal)
            try:
                yield from self._finish(p, emit, precal)
            except Exception as exc:  # noqa: BLE001
                # reads this pending stashed before the failure get the
                # fallback yield below — drop them from the stash or the
                # end-of-stream flush would emit them a SECOND time
                del precal[n_stashed:]
                for meta in p.meta:
                    for name, read, _ in meta:
                        if errors is not None:
                            errors.append((name, exc))
                        yield (name, read) + fallback(read)

        for name, read in items:
            bad = read.n_bases < 2 or (
                isinstance(read, ReadData)
                and read.read_start_rel_to_raw >= len(read.signal)
            )
            if bad:
                exc = ValueError(
                    f"read has too few bases ({read.n_bases}) or no signal"
                )
                if errors is not None:
                    errors.append((name, exc))
                yield (name, read) + fallback(read)
                continue
            try:
                if isinstance(read, WireRead):
                    prepped = read
                elif isinstance(read, CompactRead):
                    prepped = encode_read(read)
                else:
                    prepped = encode_read(compact_read(read))
            except Exception as exc:  # noqa: BLE001 — per-read degradation
                if errors is not None:
                    errors.append((name, exc))
                yield (name, read) + fallback(read)
                continue
            try:
                added = self._add_read(batch, name, read, prepped)
                if not added:
                    flush()
                    added = self._add_read(batch, name, read, prepped)
                if not added:
                    # single read exceeds the batch budget
                    raise ValueError(
                        f"read too large for batch: {read.n_bases} bases / "
                        f"{prepped.n_samples} samples"
                    )
            except Exception as exc:  # noqa: BLE001 — per-read degradation
                if errors is not None:
                    errors.append((name, exc))
                yield (name, read) + fallback(read)
                continue
            if len(pending) > self.max_in_flight:
                yield from drain(pending.popleft())
        flush(force=True)
        while pending:
            yield from drain(pending.popleft())
        if precal:
            # every read in the stream was too short for confident
            # calibration — calibrate from the longest one with the sample
            # floor lowered, loudly (round-4 advisor finding: ending the
            # stream uncalibrated must not silently use the default offset)
            import logging

            longest = max(precal, key=lambda it: len(it[2]))
            off, agree = calibrate_center_offset(
                longest[1].bases, longest[2], self.window, min_n=8)
            self._center_offset = off
            logging.getLogger("nanoreviser_tpu").warning(
                "stream ended before a read long enough for confident "
                "center-offset calibration; calibrated from a %d-window "
                "read: offset %d (agreement %.3f)",
                len(longest[2]), off, agree,
            )
            yield from self._flush_precal(precal)

    def revise_read(self, read: ReadData) -> str:
        for _, _, seq, _ in self.revise_stream([("", read)]):
            return seq
        return read.bases
