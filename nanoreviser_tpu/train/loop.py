"""Training loop: Keras-fit semantics on the dp-sharded JAX train step.

Improvements over the reference (SURVEY.md §5): per-epoch checkpointing with
resume (the reference only saves after all epochs), metrics history CSV +
params JSON in the reference's exact artifact scheme, and optional transfer
learning from an existing weight file (the reference parses
--model{1,2}_train_dir but never uses them).
"""

from __future__ import annotations

import os
import pickle
import time

import jax
import numpy as np

from ..models.reviser import ReviserConfig, init_reviser_params, reviser_apply
from .data import BatchIterator
from .step import (
    default_class_weights,
    keras_adam,
    make_multi_step,
    make_sharded_multi_step,
    make_sharded_train_step,
    make_train_step,
)


def save_checkpoint(path: str, params, opt_state, epoch: int) -> None:
    payload = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": jax.tree.map(np.asarray, opt_state),
        "epoch": epoch,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as fp:
        pickle.dump(payload, fp)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    with open(path, "rb") as fp:
        return pickle.load(fp)  # noqa: S301 — our own artifact


def train_model(
    x_train: np.ndarray,
    signal_x_train: np.ndarray,
    y_train: np.ndarray,
    *,
    n_classes: int,
    window: int,
    epochs: int = 50,
    batch_size: int = 512,
    validation_split: float = 0.01,
    learning_rate: float = 1e-3,
    seed: int = 0,
    init_params=None,
    checkpoint_path: str | None = None,
    resume: bool = False,
    verbose: bool = True,
    mesh=None,
    steps_per_dispatch: int = 8,
) -> tuple[dict, dict]:
    """Train one reviser model; returns (params, history dict of lists).

    x_train/signal_x_train are either pre-windowed [W, T, *] tensors or
    streaming base arrays [N, *] (windows gathered per batch; see
    BatchIterator) — y_train is [W, 1] window-center targets either way.
    """
    cfg = ReviserConfig(window=window, n_classes=n_classes)
    rng = jax.random.PRNGKey(seed)
    params = init_params
    if params is None:
        params = init_reviser_params(rng, cfg)
    if "centers" not in params:
        params = dict(params)
        params["centers"] = np.zeros((n_classes, 16), np.float32)

    optimizer = keras_adam(learning_rate)
    opt_state = optimizer.init(params)
    start_epoch = 0
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        ck = load_checkpoint(checkpoint_path)
        params, opt_state, start_epoch = ck["params"], ck["opt_state"], ck["epoch"]
        if verbose:
            print(f"[p:::] resumed from {checkpoint_path} at epoch {start_epoch}")

    class_weights = default_class_weights(n_classes)
    cw = jax.numpy.asarray(class_weights)  # jnp: indexed by traced batch["y"]

    # ONE train-step implementation for single-chip, dp-sharded, multi-host,
    # and the driver's multichip dryrun: train/step.py (VERDICT r1 item 4/10)
    multiproc = jax.process_count() > 1
    # K steps per device dispatch (lax.scan): the tunnel attachment's 4-25 ms
    # per-dispatch latency dominates the ~3 ms step compute, so the naive
    # per-step loop trains at a fraction of the chip's rate. Multi-host keeps
    # K=1 (its batch placement is a collective with its own ordering).
    k_steps = 1 if multiproc else max(1, steps_per_dispatch)
    multi_step = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        step, _ = make_sharded_train_step(cfg, mesh, optimizer=optimizer)
        if k_steps > 1:
            multi_step, _ = make_sharded_multi_step(
                cfg, mesh, optimizer=optimizer)
        rep = NamedSharding(mesh, P())
        if multiproc:
            # same params on every host (same seed/checkpoint) -> one global
            # replicated array per leaf
            params = jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    rep, np.asarray(x)
                ),
                params,
            )
            opt_state = jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    rep, np.asarray(x)
                ),
                opt_state,
            )
        else:
            params = jax.device_put(params, rep)
            opt_state = jax.device_put(opt_state, rep)
    else:
        raw_step, _ = make_train_step(cfg, optimizer=optimizer)
        step = jax.jit(raw_step, donate_argnums=(0, 1))
        if k_steps > 1:
            multi_step, _ = make_multi_step(cfg, optimizer=optimizer)

    def globalize(batch: dict) -> dict:
        """Multi-host: batches are built identically everywhere (same corpus,
        same seed); each process donates its slice of the global batch."""
        if mesh is None or not multiproc:
            return batch
        from ..dist import distribute_batch, local_batch_slice

        return distribute_batch(
            mesh, local_batch_slice(batch, jax.process_index(),
                                    jax.process_count())
        )

    def eval_loss(params, batch):
        probs, _ = reviser_apply(params, batch["signal"], batch["feats"], cfg=cfg)
        p = np.float32(1e-7)
        pc = jax.numpy.clip(probs, p, 1 - p)
        ce = -jax.numpy.log(
            jax.numpy.take_along_axis(pc, batch["y"][:, None], axis=1)
        )[:, 0]
        denom = jax.numpy.maximum(jax.numpy.sum(batch["weight"]), 1.0)
        loss = jax.numpy.sum(ce * cw[batch["y"]] * batch["weight"]) / denom
        acc = jax.numpy.sum(
            (jax.numpy.argmax(probs, -1) == batch["y"]) * batch["weight"]
        ) / denom
        return loss, acc

    eval_step = jax.jit(eval_loss)

    it = BatchIterator(
        x_train, signal_x_train, y_train, batch_size, validation_split, seed,
        window=window,
    )
    history: dict[str, list] = {
        "loss": [], "accuracy": [], "val_loss": [], "val_accuracy": [],
    }
    def chunked(batches):
        """Group same-shape consecutive batches into stacks of k_steps for
        the multi-step dispatch; odd-shaped or leftover batches pass through
        singly. Yields (count, batch_or_stack)."""
        buf: list = []

        def flush_stacked():
            if len(buf) == k_steps:
                yield len(buf), {
                    key: np.stack([b[key] for b in buf]) for key in buf[0]
                }
            else:
                for b in buf:
                    yield 1, b
            buf.clear()

        for b in batches:
            if multi_step is None:
                yield 1, b
                continue
            if buf and b["y"].shape != buf[0]["y"].shape:
                yield from flush_stacked()
            buf.append(b)
            if len(buf) == k_steps:
                yield from flush_stacked()
        yield from flush_stacked()

    def prefetched(counted_batches, depth: int = 2):
        """Host->device batch pipeline: device_put of chunk k+1/k+2 runs on
        an upload thread while chunk k computes. Over the tunnel-attached
        chip the synchronous per-dispatch transfer (+ RTT) was the train
        loop's dominant cost; prefetching overlaps it with compute."""
        if mesh is None or multiproc:
            # multi-host placement (make_array_from_process_local_data) has
            # its own collective ordering — keep it on the caller thread
            for c, b in counted_batches:
                yield c, (globalize(b) if c == 1 else b)
            return
        import collections
        import concurrent.futures as cf

        from jax.sharding import NamedSharding, PartitionSpec as P

        sh1 = NamedSharding(mesh, P("dp"))
        shk = NamedSharding(mesh, P(None, "dp"))
        ex = cf.ThreadPoolExecutor(1)
        q: collections.deque = collections.deque()
        try:
            for c, b in counted_batches:
                q.append((c, ex.submit(
                    jax.device_put, b, sh1 if c == 1 else shk)))
                if len(q) > depth:
                    c0, fut = q.popleft()
                    yield c0, fut.result()
            while q:
                c0, fut = q.popleft()
                yield c0, fut.result()
        finally:
            ex.shutdown(wait=False)

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses, accs = [], []
        for count, batch in prefetched(chunked(it.epoch())):
            rng, drop = jax.random.split(rng)
            if count == 1:
                params, opt_state, metrics = step(
                    params, opt_state, batch, drop
                )
            else:
                params, opt_state, metrics = multi_step(
                    params, opt_state, batch, jax.random.split(drop, count)
                )
            losses.append(metrics["loss"])
            accs.append(metrics["accuracy"])
        ep_loss = float(np.mean(np.concatenate(
            [np.atleast_1d(np.asarray(v)) for v in losses])))
        ep_acc = float(np.mean(np.concatenate(
            [np.atleast_1d(np.asarray(v)) for v in accs])))
        vl, va = [], []
        for batch in it.validation():
            loss, acc = eval_step(params, globalize(batch))
            vl.append(loss)
            va.append(acc)
        val_loss = float(np.mean([np.asarray(v) for v in vl])) if vl else float("nan")
        val_acc = float(np.mean([np.asarray(v) for v in va])) if va else float("nan")
        history["loss"].append(ep_loss)
        history["accuracy"].append(ep_acc)
        history["val_loss"].append(val_loss)
        history["val_accuracy"].append(val_acc)
        if verbose:
            print(
                f"[p:::] epoch {epoch + 1}/{epochs} loss={ep_loss:.4f} "
                f"acc={ep_acc:.4f} val_loss={val_loss:.4f} "
                f"({time.time() - t0:.1f}s)"
            )
        if checkpoint_path and jax.process_index() == 0:
            save_checkpoint(checkpoint_path, params, opt_state, epoch + 1)

    params = jax.tree.map(np.asarray, params)
    return params, history


def save_params_npz(params: dict, path: str) -> None:
    """Flat .npz export of a param pytree (our native weight format)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}{k}/", v)
        else:
            flat[prefix[:-1]] = np.asarray(node)

    walk("", params)
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    z = np.load(path)
    params: dict = {}
    for key in z.files:
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = z[key]
    return params
