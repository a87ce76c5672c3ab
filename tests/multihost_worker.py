"""Worker for test_multihost: one simulated host in a 2-process CPU job.

Spawned with argv: <coordinator> <num_processes> <process_id>.
Runs one epoch of DP training over the global mesh and prints a JSON line
with the final loss and a params digest (must match across processes).
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=nproc, process_id=pid
    )

    import numpy as np
    from jax.sharding import Mesh

    from nanoreviser_tpu.train.loop import train_model

    assert jax.process_count() == nproc
    devices = jax.devices()
    assert len(devices) == 2 * nproc, devices
    mesh = Mesh(np.asarray(devices), ("dp",))

    rng = np.random.default_rng(0)          # same corpus on every host
    n, t = 128, 5
    x = rng.normal(size=(n, t, 6)).astype(np.float32)
    sig = rng.normal(size=(n, t, 50)).astype(np.float32)
    y = rng.integers(0, 6, size=(n, 1)).astype(np.int32)

    params, history = train_model(
        x, sig, y,
        n_classes=6, window=t, epochs=1, batch_size=32,
        validation_split=0.1, verbose=False, mesh=mesh,
    )
    digest = float(
        sum(np.abs(np.asarray(leaf)).sum() for leaf in jax.tree.leaves(params))
    )
    print(json.dumps({
        "process": pid,
        "loss": float(history["loss"][0]),
        "val_loss": float(history["val_loss"][0]),
        "digest": digest,
    }), flush=True)


if __name__ == "__main__":
    main()
