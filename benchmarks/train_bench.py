#!/usr/bin/env python
"""Training throughput benchmarks.

Two modes:
  (default)        steps/s of the jitted train step on the current backend
                   (the real chip under the bench), synthetic streaming
                   corpus shaped like the reference's (window 13, 50-sample
                   signal rows, 6 features).
  --scaling-proxy  1-device vs 8-virtual-device CPU mesh steps/s + loss
                   parity (run with JAX_PLATFORMS=cpu and
                   XLA_FLAGS=--xla_force_host_platform_device_count=8);
                   a wall-clock proxy for DP scaling efficiency on a host
                   with no multi-chip hardware.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WINDOW = 13
BATCH = 512
N_CLASSES = 6


def _corpus(n_rows=40960, seed=0):
    rng = np.random.default_rng(seed)
    sig = rng.normal(size=(n_rows, 50)).astype(np.float32)
    feats = rng.normal(size=(n_rows, 6)).astype(np.float32)
    y = rng.integers(0, N_CLASSES, (n_rows - WINDOW, 1)).astype(np.int32)
    return feats, sig, y


def _steps_per_s(mesh, devices, n_steps=20):
    import jax

    from nanoreviser_tpu.models.reviser import (
        ReviserConfig,
        init_reviser_params,
    )
    from nanoreviser_tpu.train.step import (
        keras_adam,
        make_sharded_train_step,
        make_train_step,
    )

    cfg = ReviserConfig(window=WINDOW, n_classes=N_CLASSES)
    rng = jax.random.PRNGKey(0)
    params = init_reviser_params(rng, cfg)
    params["centers"] = np.zeros((N_CLASSES, 16), np.float32)
    optimizer = keras_adam()
    opt_state = optimizer.init(params)

    feats, sig, y = _corpus()
    rows = np.arange(BATCH)[:, None] + np.arange(WINDOW)[None, :]
    batch = {
        "signal": sig[rows],
        "feats": feats[rows],
        "y": y[:BATCH, 0],
        "weight": np.ones(BATCH, np.float32),
    }

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        step, _ = make_sharded_train_step(cfg, mesh, optimizer=optimizer)
        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
        batch = jax.device_put(batch, NamedSharding(mesh, P("dp")))
    else:
        raw_step, _ = make_train_step(cfg, optimizer=optimizer)
        step = jax.jit(raw_step, donate_argnums=(0, 1))

    params, opt_state, metrics = step(params, opt_state, batch,
                                      jax.random.PRNGKey(1))
    jax.block_until_ready(metrics["loss"])
    first_loss = float(metrics["loss"])

    t0 = time.time()
    for k in range(n_steps):
        params, opt_state, metrics = step(params, opt_state, batch,
                                          jax.random.PRNGKey(2 + k))
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0
    return n_steps / dt, first_loss


def main():
    if "--scaling-proxy" in sys.argv:
        # the base env pins JAX_PLATFORMS=axon and the env var alone does not
        # win; force the CPU platform via jax.config (same as tests/conftest)
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
        from nanoreviser_tpu.parallel import make_mesh

        devs = jax.devices()
        m1 = make_mesh(devs[:1])
        m8 = make_mesh(devs)
        assert len(devs) == 8, devs
        sps1, loss1 = _steps_per_s(m1, devs[:1], n_steps=8)
        sps8, loss8 = _steps_per_s(m8, devs, n_steps=8)
        print(json.dumps({
            "n_devices": len(devs),
            "steps_per_s_1dev": round(sps1, 3),
            "steps_per_s_8dev": round(sps8, 3),
            "efficiency_proxy": round(sps8 / sps1, 3),
            "loss_parity": bool(abs(loss1 - loss8) < 1e-5),
            "note": "8 virtual CPU devices share 2 host cores; wall-clock "
                    "efficiency here measures program overhead, not ICI",
        }))
        return

    import jax  # noqa: F401 — default backend (the chip under the bench)

    sps, _ = _steps_per_s(None, None, n_steps=30)
    print(json.dumps({
        "train_steps_per_s": round(sps, 3),
        "train_windows_per_s": round(sps * BATCH, 1),
        "batch_size": BATCH,
    }))


if __name__ == "__main__":
    main()
