"""JAX banded affine-gap alignment — the TPU-native GraphMap replacement.

The reference labels training reads by shelling out to the GraphMap aligner
per read (reference alignutils.py:30-63). Here the same role is filled by:

1. k-mer seeding (host, numpy): locate the read on the genome and pick the
   best diagonal + strand from exact-match seed votes;
2. banded affine-gap GLOCAL alignment (read global, target local) of the read
   against the seeded genome window, as a jit-compiled row scan: each query
   row updates its whole diagonal band in parallel on the VPU. The in-row
   left-gap chain F(k) = max_{k'<k} H(k') + open + (k-k')*ext is computed
   with an exact log-step max-plus prefix scan (valid because open <= ext
   makes re-opening inside a gap never optimal);
3. backpointers are 2-bit moves packed 4-per-byte on device (the d2h link is
   ~8 MB/s; packing cuts a 6 MB tensor to 1.5 MB), traceback on host.

The output is per-column (read, ref, map) arrays in exactly the shape
produced by align.sam.parse_sam_record, so the downstream label pipeline
(align.labels) is shared between the GraphMap-subprocess oracle and this
native path.

GraphMap is a full seed-and-extend mapper; exact SAM parity is not a goal
(SURVEY.md §7 hard-part 4). Quality is validated by label-recovery accuracy
on synthetic mutated references (tests/test_sw.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e9

DIAG, UP, LEFT = 0, 1, 2  # 2-bit move codes

_BASE_CODE = np.full(256, 4, np.int8)
for _i, _b in enumerate("ACGT"):
    _BASE_CODE[ord(_b)] = _i
_COMP_CODE = np.array([3, 2, 1, 0, 4], np.int8)


def encode_seq(seq: str) -> np.ndarray:
    return _BASE_CODE[np.frombuffer(seq.encode("ascii"), np.uint8)]


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    return _COMP_CODE[codes[::-1]]


# ------------------------------------------------------------------- seeding


@dataclass
class SeedHit:
    chrom: str
    strand: str
    t_start: int
    t_end: int
    votes: int
    margin_lead: int = 0      # expected unaligned target prefix in the window
    margin_tail: int = 0      # expected unaligned target suffix


def _rolling_kmers(codes: np.ndarray, k: int, stride: int) -> np.ndarray:
    if len(codes) < k:
        return np.zeros(0, np.int64)
    acc = np.zeros(len(codes) - k + 1, np.int64)
    for i in range(k):
        acc = acc * 4 + codes[i : len(codes) - k + 1 + i]
    win = np.lib.stride_tricks.sliding_window_view(codes == 4, k)
    return np.where(win.any(axis=1), -1, acc)


class KmerIndex:
    """Host-side exact-match k-mer index over the genome (numpy).

    Memory: 8 bytes per indexed position (int32 k-mer code for k <= 15 +
    int32/int64 position). For genomes over ~50 Mbp, positions are sampled
    every ``stride`` bases (seed votes only need a sparse diagonal
    consensus), keeping a human-genome index ~6 GB instead of the ~50 GB a
    dense int64 table would need.
    """

    def __init__(self, genome: dict[str, str], k: int = 15,
                 stride: int | None = None):
        if k > 15:
            raise ValueError("k must be <= 15 (int32 k-mer codes)")
        total = sum(len(s) for s in genome.values())
        if stride is None:
            stride = 1 if total < 50_000_000 else 4
        self.k = k
        self.stride = stride
        self._tables = {}
        for chrom, seq in genome.items():
            codes = encode_seq(seq)
            kmers = _rolling_kmers(codes, k, 1)
            pos = np.arange(0, len(kmers), stride)
            sampled = kmers[pos].astype(np.int32)
            order = np.argsort(sampled, kind="stable")
            pos_dtype = np.int32 if len(codes) < 2**31 else np.int64
            self._tables[chrom] = (
                sampled[order], pos[order].astype(pos_dtype), codes
            )

    def seed(
        self, read_codes: np.ndarray, margin: int = 400, sample_stride: int = 11
    ) -> SeedHit | None:
        k = self.k
        best = None
        for strand, q in (("+", read_codes), ("-", revcomp_codes(read_codes))):
            q_kmers = _rolling_kmers(q, k, 1)
            sample = np.arange(0, len(q_kmers), sample_stride)
            q_sample = q_kmers[sample].astype(np.int32)
            for chrom, (skmers, spos, codes) in self._tables.items():
                lo = np.searchsorted(skmers, q_sample, side="left")
                hi = np.searchsorted(skmers, q_sample, side="right")
                n_hits = hi - lo
                ok = (q_sample >= 0) & (n_hits > 0) & (n_hits <= 8)
                if not ok.any():
                    continue
                diags = np.concatenate(
                    [
                        spos[l:h] - qi
                        for qi, l, h in zip(sample[ok], lo[ok], hi[ok])
                    ]
                )
                uniq, counts = np.unique(diags // 64, return_counts=True)
                top = int(counts.argmax())
                votes = int(counts[top])
                if best is None or votes > best[0]:
                    diag = int(uniq[top] * 64)
                    t_start = max(diag - margin, 0)
                    t_end = min(diag + len(q) + margin, len(codes))
                    best = (
                        votes,
                        SeedHit(
                            chrom, strand, t_start, t_end, votes,
                            margin_lead=diag - t_start,
                            margin_tail=max(t_end - (diag + len(q)), 0),
                        ),
                    )
        return best[1] if best else None


# ------------------------------------------------------------------ banded DP


@functools.partial(jax.jit, static_argnames=("m_pad", "n_pad", "band"))
def _banded_align_emit(
    q, t, m, n, j_lead, j_tail, match, mismatch, gap_open, gap_extend,
    *, m_pad: int, n_pad: int, band: int,
):
    half = band // 2
    ks = jnp.arange(band)
    log_steps = int(np.ceil(np.log2(band)))

    # band center line: interpolate from the expected first aligned target
    # column (j_lead) to the expected last (n - j_tail) across the read
    span = jnp.maximum(n - j_lead - j_tail, 1)

    def j0(i):
        return j_lead + (span * i) // jnp.maximum(m, 1)

    def scan_body(carry, i):
        h_prev, e_prev = carry
        shift = j0(i) - j0(i - 1)

        def sh(x, d):
            src = ks + shift + d
            return jnp.where(
                (src >= 0) & (src < band),
                x[jnp.clip(src, 0, band - 1)],
                NEG_INF,
            )

        h_diag = sh(h_prev, -1)
        h_up = sh(h_prev, 0)
        e_up = sh(e_prev, 0)

        j = j0(i) + ks - half
        valid_j = (j >= 0) & (j < n)
        qi = q[jnp.clip(i, 0, m_pad - 1)]
        tj = t[jnp.clip(j, 0, n_pad - 1)]
        sub = jnp.where(qi == tj, match, mismatch)

        diag_score = h_diag + sub
        e = jnp.maximum(h_up + gap_open, e_up + gap_extend)
        h_nf = jnp.where(valid_j, jnp.maximum(diag_score, e), NEG_INF)

        g = h_nf - ks * gap_extend
        run = g
        for p in range(log_steps):
            s = 1 << p
            prev = jnp.where(ks >= s, run[jnp.clip(ks - s, 0, band - 1)], NEG_INF)
            run = jnp.maximum(run, prev)
        p_excl = jnp.where(ks >= 1, run[jnp.clip(ks - 1, 0, band - 1)], NEG_INF)
        f = gap_open + ks * gap_extend + p_excl

        h_row = jnp.where(valid_j, jnp.maximum(h_nf, f), NEG_INF)
        move = jnp.where(
            h_row == diag_score, DIAG, jnp.where(h_row == e, UP, LEFT)
        ).astype(jnp.uint8)
        packed = (
            move.reshape(band // 4, 4)
            * jnp.asarray([1, 4, 16, 64], jnp.uint8)[None, :]
        ).sum(axis=1, dtype=jnp.uint8)
        # capture the true final row's scores via masking
        is_final = i == (m - 1)
        final_row = jnp.where(is_final, h_row, NEG_INF)
        return (h_row, e), (packed, final_row)

    j_row0 = j0(0) + ks - half
    tj0 = t[jnp.clip(j_row0, 0, n_pad - 1)]
    sub0 = jnp.where(q[0] == tj0, match, mismatch)
    h0 = jnp.where((j_row0 >= 0) & (j_row0 < n), sub0, NEG_INF)
    e0 = jnp.full(band, NEG_INF)

    (_, _), (packed, final_rows) = jax.lax.scan(
        scan_body, (h0, e0), jnp.arange(1, m_pad)
    )
    packed = jnp.concatenate([jnp.zeros((1, band // 4), jnp.uint8), packed])
    final_row = jnp.max(final_rows, axis=0)
    final_row = jnp.where(m == 1, h0, final_row)  # single-row edge case
    k_end = jnp.argmax(final_row)
    score = final_row[k_end]
    return score, k_end, packed


def _traceback_host(
    packed: np.ndarray, m: int, n: int, band: int, k_end: int,
    t_lead: int = 0, t_tail: int = 0,
) -> tuple[np.ndarray, int]:
    """Walk packed moves from (m-1, k_end); returns (ops fwd order, j_start)."""
    half = band // 2
    span = max(n - t_lead - t_tail, 1)

    def j0(i):
        return t_lead + (span * i) // max(m, 1)

    def move_at(i, k):
        byte = packed[i, k >> 2]
        return (byte >> ((k & 3) * 2)) & 3

    ops = []
    i = m - 1
    j = j0(i) + k_end - half
    while i > 0:
        k = j - j0(i) + half
        if k < 0 or k >= band:
            while i > 0:
                ops.append(DIAG)
                i -= 1
                j -= 1
            break
        mv = int(move_at(i, k))
        if mv == DIAG:
            ops.append(DIAG)
            i -= 1
            j -= 1
        elif mv == UP:
            ops.append(UP)
            i -= 1
        else:
            ops.append(LEFT)
            j -= 1
    ops.append(DIAG)  # row 0 consumes (q[0], t[j])
    return np.asarray(ops[::-1], np.int8), j


# ---------------------------------------------------------------- public API


@dataclass
class AlignmentResult:
    read_vals: str
    ref_vals: str
    map_vals: str
    strand: str
    chrom: str
    genome_start: int
    score: float
    start_clipped_bases: int = 0   # read bases clipped, ORIGINAL orientation
    end_clipped_bases: int = 0


DEFAULT_SCORES = dict(match=2.0, mismatch=-3.0, gap_open=-5.0, gap_extend=-2.0)


def align_banded(
    read_seq: str,
    target_seq: str,
    band: int = 512,
    t_lead: int = 0,
    t_tail: int = 0,
    backend: str = "auto",
    **score_overrides,
) -> tuple[np.ndarray, int, float]:
    """Glocal banded alignment. Returns (ops, j_start, score).

    t_lead/t_tail: expected unaligned target overhangs (the seed margins) —
    they center the band on the true alignment line.

    backend: "auto" prefers the native C++ DP (nanoreviser_tpu.native) —
    identical semantics, no device round-trip — falling back to the JAX
    path; "jax"/"native" force one.
    """
    scores = dict(DEFAULT_SCORES, **score_overrides)
    q = encode_seq(read_seq)
    t = encode_seq(target_seq)
    m, n = len(q), len(t)

    if backend in ("auto", "native"):
        from .. import native

        if native.available():
            return native.banded_sw_native(
                q, t, band=band, t_lead=t_lead, t_tail=t_tail,
                match=scores["match"], mismatch=scores["mismatch"],
                gap_open=scores["gap_open"], gap_extend=scores["gap_extend"],
            )
        if backend == "native":
            raise RuntimeError("native backend requested but unavailable")

    m_pad = -(-m // 256) * 256
    n_pad = -(-n // 256) * 256
    q_p = np.full(m_pad, 4, np.int8)
    q_p[:m] = q
    t_p = np.full(n_pad, 4, np.int8)
    t_p[:n] = t
    score, k_end, packed = _banded_align_emit(
        jnp.asarray(q_p), jnp.asarray(t_p), jnp.int32(m), jnp.int32(n),
        jnp.int32(t_lead), jnp.int32(t_tail),
        jnp.float32(scores["match"]), jnp.float32(scores["mismatch"]),
        jnp.float32(scores["gap_open"]), jnp.float32(scores["gap_extend"]),
        m_pad=m_pad, n_pad=n_pad, band=band,
    )
    ops, j_start = _traceback_host(
        np.asarray(packed), m, n, band, int(k_end), t_lead, t_tail
    )
    return ops, j_start, float(score)


def clip_ops(
    ops: np.ndarray,
    read_seq: str,
    target_seq: str,
    j_start: int,
    q_start: int = 0,
    **score_overrides,
) -> tuple[np.ndarray, int, int, int, int]:
    """Soft-clip garbage alignment ends (GraphMap emits S/H clips for
    unalignable read ends like adapters, reference alignutils.py:80-94; a
    glocal DP instead forces them through as noise columns).

    Kadane-style maximal-scoring run over per-column scores: keep the
    contiguous op segment with the highest score sum, drop the rest as
    clips. Returns (ops', j_start', q_start', head_read_clip,
    tail_read_clip) where the clips count READ bases removed.
    """
    if len(ops) == 0:
        return ops, j_start, q_start, 0, 0
    scores = dict(DEFAULT_SCORES, **score_overrides)
    qi, ti = q_start, j_start
    col_scores = np.empty(len(ops), np.float64)
    prev = -1
    for idx, op in enumerate(ops):
        if op == DIAG:
            col_scores[idx] = (
                scores["match"]
                if read_seq[qi] == target_seq[ti]
                else scores["mismatch"]
            )
            qi += 1
            ti += 1
        else:
            col_scores[idx] = (
                scores["gap_extend"] if op == prev else scores["gap_open"]
            )
            qi += op == UP
            ti += op == LEFT
        prev = op

    cum = np.concatenate([[0.0], np.cumsum(col_scores)])
    run_min = np.minimum.accumulate(cum[:-1])
    gains = cum[1:] - run_min
    b = int(np.argmax(gains)) + 1                      # exclusive end
    a = int(np.argmin(cum[:b]))                       # inclusive start
    reads_consumed = (np.asarray(ops) != LEFT).astype(np.int64)
    target_consumed = (np.asarray(ops) != UP).astype(np.int64)
    head_clip = int(reads_consumed[:a].sum())
    tail_clip = int(reads_consumed[b:].sum())
    j_start2 = j_start + int(target_consumed[:a].sum())
    return ops[a:b], j_start2, q_start + head_clip, head_clip, tail_clip


def columns_from_ops(
    ops: np.ndarray, read_seq: str, target_seq: str, t_offset: int,
    q_offset: int = 0,
) -> tuple[str, str, str]:
    """(read_vals, ref_vals, map_vals) columns from move codes."""
    read_parts: list[str] = []
    ref_parts: list[str] = []
    map_parts: list[str] = []
    qi, ti = q_offset, t_offset
    for op in ops:
        if op == DIAG:
            a, b = read_seq[qi], target_seq[ti]
            read_parts.append(a)
            ref_parts.append(b)
            map_parts.append("M" if a == b else "X")
            qi += 1
            ti += 1
        elif op == UP:
            read_parts.append(read_seq[qi])
            ref_parts.append("-")
            map_parts.append("I")
            qi += 1
        else:
            read_parts.append("-")
            ref_parts.append(target_seq[ti])
            map_parts.append("D")
            ti += 1
    return "".join(read_parts), "".join(ref_parts), "".join(map_parts)


def align_read_to_genome(
    read_seq: str,
    index: KmerIndex,
    genome: dict[str, str],
    band: int = 512,
    clip_ends: bool = True,
    **score_overrides,
) -> AlignmentResult | None:
    """Full seed + banded-extend pipeline (the GraphMap-equivalent call).

    Matches the reference's parse_sam_record output conventions
    (input_handeler.py:60-160): columns are in ORIGINAL-read orientation
    (for '-' hits the target is viewed reverse-complemented), and
    unalignable read ends are soft-clipped with the clip counts reported
    (GraphMap S/H clips, reference alignutils.py:80-94) so downstream
    fix_raw_starts_for_clipped_bases can trim the signal correspondingly.
    """
    from .sam import rev_comp

    codes = encode_seq(read_seq)
    hit = index.seed(codes)
    if hit is None:
        return None
    target = genome[hit.chrom][hit.t_start : hit.t_end]
    q_seq = read_seq if hit.strand == "+" else rev_comp(read_seq)
    t_lead = hit.margin_lead if hit.strand == "+" else hit.margin_tail
    t_tail = hit.margin_tail if hit.strand == "+" else hit.margin_lead
    ops, j_start, score = align_banded(
        q_seq, target, band=band, t_lead=t_lead, t_tail=t_tail,
        **score_overrides,
    )
    q_start = 0
    head_clip = tail_clip = 0
    if clip_ends:
        ops, j_start, q_start, head_clip, tail_clip = clip_ops(
            ops, q_seq, target, j_start, **score_overrides
        )
    if len(ops) < 8:
        # all-garbage alignment: clipping left (at most) a token segment —
        # treat the read as unmapped rather than emit meaningless labels
        return None
    read_vals, ref_vals, map_vals = columns_from_ops(
        ops, q_seq, target, j_start, q_offset=q_start
    )
    if hit.strand == "-":
        # reference convention: columns in original-read orientation
        read_vals = rev_comp(read_vals)
        ref_vals = rev_comp(ref_vals)
        map_vals = map_vals[::-1]
        head_clip, tail_clip = tail_clip, head_clip
    return AlignmentResult(
        read_vals=read_vals,
        ref_vals=ref_vals,
        map_vals=map_vals,
        strand=hit.strand,
        chrom=hit.chrom,
        genome_start=hit.t_start + j_start,
        score=score,
        start_clipped_bases=head_clip,
        end_clipped_bases=tail_clip,
    )
