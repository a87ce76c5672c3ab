"""Batched TPU inference: read -> sliding windows -> model1+model2 -> merge.

This is the resurrection of the reference's dormant model path (SURVEY.md
§3.2) as a TPU-native pipeline:

* host: vectorized decode + windowing (numpy) produce per-read tensors
  [N,50] signal windows and [N,6] features;
* device: one jitted function gathers length-T sliding windows *on device*
  (avoiding a T-times host->device blowup), runs both models over all windows
  in VMEM-friendly chunks via ``lax.map``, and returns per-window argmax
  labels for both models;
* reads are padded to a small set of bucket lengths so XLA compiles a handful
  of programs, then results are sliced back to true length on host;
* host: vectorized revision merge (see merge.py) + fasta/fastq emission.

The reference parallelized with one OS process per read; here per-read
parallelism is the window batch dimension, sharded over the device mesh
(axis "dp") when more than one device is present.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..io.fast5 import ReadData
from ..models import load_keras_weights
from ..models.reviser import ReviserConfig, reviser_apply
from ..parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from ..signal.features import assemble_features
from ..signal.segmentation import segment_signal
from .merge import merge_revision

# window-count buckets: multiples of the chunk size keep lax.map shapes static
DEFAULT_CHUNK = 2048
# bucket sizes in chunk multiples — a small set so XLA compiles few programs
BUCKET_MULTIPLES = (1, 2, 4, 6, 8, 12, 16, 24, 32)


def _forward_chunked(params1, params2, sigwin, feats, window: int, chunk: int):
    """All sliding windows of one padded read through both models.

    sigwin: [P, 50] float32; feats: [P, 6] float32. P - window must be a
    multiple of ``chunk``. Returns (y1 [P-window], y2 [P-window]) int32.
    """
    n_windows = sigwin.shape[0] - window
    n_chunks = n_windows // chunk
    t_idx = jnp.arange(window)[None, :]

    def one_chunk(start):
        w_idx = start + jnp.arange(chunk)[:, None] + t_idx      # [chunk, T]
        sig_w = sigwin[w_idx]                                   # [chunk, T, 50]
        feat_w = feats[w_idx]                                   # [chunk, T, 6]
        p1, _ = reviser_apply(params1, sig_w, feat_w)
        p2, _ = reviser_apply(params2, sig_w, feat_w)
        return jnp.argmax(p1, axis=-1).astype(jnp.int32), jnp.argmax(
            p2, axis=-1
        ).astype(jnp.int32)

    starts = jnp.arange(n_chunks) * chunk
    y1, y2 = jax.lax.map(one_chunk, starts)
    return y1.reshape(-1), y2.reshape(-1)


def revise_read_passthrough(read: ReadData) -> str:
    """The shipped reference's observable behavior: event-derived bases."""
    return read.bases


class ReviserEngine:
    """Loads both reviser models and revises reads on the device mesh."""

    def __init__(
        self,
        model1_path: str,
        model2_path: str,
        *,
        chunk: int = DEFAULT_CHUNK,
        align: str = "reference",
        mesh=None,
        devices=None,
    ):
        self.params1, win1, nc1 = load_keras_weights(model1_path)
        self.params2, win2, nc2 = load_keras_weights(model2_path)
        if win1 != win2:
            raise ValueError(f"model window mismatch: {win1} vs {win2}")
        self.window = win1
        self.n_classes = (nc1, nc2)
        self.chunk = chunk
        self.align = align
        self.cfg1 = ReviserConfig(window=win1, n_classes=nc1)
        self.cfg2 = ReviserConfig(window=win2, n_classes=nc2)

        self.mesh = mesh if mesh is not None else make_mesh(devices)
        n_dev = self.mesh.devices.size
        # chunk must split evenly over the mesh for dp sharding
        if chunk % n_dev:
            raise ValueError(f"chunk {chunk} not divisible by {n_dev} devices")
        rep = replicated_sharding(self.mesh)
        self.params1 = jax.device_put(self.params1, rep)
        self.params2 = jax.device_put(self.params2, rep)
        self._data_sharding = batch_sharding(self.mesh)
        self._rep_sharding = rep

        self._fn = jax.jit(
            functools.partial(
                _forward_chunked, window=self.window, chunk=self.chunk
            ),
        )

    # ---------------------------------------------------------- preprocessing

    def preprocess(self, read: ReadData) -> tuple[np.ndarray, np.ndarray]:
        """Host-side: signal windows [N,50] + feature vectors [N,6]."""
        tail = read.signal[read.read_start_rel_to_raw :]
        seg = segment_signal(tail, read.starts, int(read.lengths[-1]))
        feats = assemble_features(
            read.bases,
            seg.event_mean,
            seg.event_std,
            read.lengths,
            read.ab_mean,
            read.ab_std,
            seg.shift,
            seg.scale,
        )
        return seg.windows, feats

    def _bucket(self, n_windows: int) -> int:
        n_chunks = max(1, math.ceil(n_windows / self.chunk))
        for m in BUCKET_MULTIPLES:
            if n_chunks <= m:
                return m * self.chunk
        return n_chunks * self.chunk

    # ------------------------------------------------------------- inference

    def predict_labels(
        self, sigwin: np.ndarray, feats: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-window argmax labels for both models, true (unpadded) length."""
        n = sigwin.shape[0]
        n_windows = n - self.window
        if n_windows <= 0:
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        padded = self._bucket(n_windows) + self.window
        sig_p = np.zeros((padded, sigwin.shape[1]), np.float32)
        feat_p = np.zeros((padded, feats.shape[1]), np.float32)
        sig_p[:n] = sigwin
        feat_p[:n] = feats
        y1, y2 = self._fn(
            self.params1,
            self.params2,
            jax.device_put(sig_p, self._rep_sharding),
            jax.device_put(feat_p, self._rep_sharding),
        )
        return np.asarray(y1)[:n_windows], np.asarray(y2)[:n_windows]

    def revise_read(self, read: ReadData) -> str:
        sigwin, feats = self.preprocess(read)
        y1, y2 = self.predict_labels(sigwin, feats)
        if len(y1) == 0:
            return read.bases
        return merge_revision(
            read.bases, y1, y2, align=self.align, window=self.window
        )

    def quality_string(self, y1_probs_len: int) -> str:
        """Placeholder constant quality for model-path fastq (the reference's
        model path never produced qualities; Guppy supplied them)."""
        return "+" * y1_probs_len
