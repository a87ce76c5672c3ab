"""Device mesh and sharding helpers.

The reviser models are tiny (~600k params), so the scaling strategy is pure
data parallelism over the window/batch dimension (SURVEY.md §2.3): parameters
replicated over ICI, batches sharded on axis "dp", gradients psum-reduced.
Reads of any length become N independent windows — sequence scaling IS the
batch dimension here, so "sequence parallelism" degenerates to sharding
windows, which this module expresses with a 1-D mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch/window) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate the parameter pytree onto every device of the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(params, sharding)
