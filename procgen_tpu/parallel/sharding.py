"""Device-mesh sharding for the env engine.

Env stepping is batch-parallel over the ``env`` axis: state leaves carry a
leading ``num_envs`` axis, so a 1-D mesh with ``NamedSharding(P("env"))`` on
every leaf lets XLA partition the whole step (physics, levelgen refill,
renderer) with zero collectives.  Multi-host pods shard the same way --
each host owns its slice of envs (the reference's analogue is rank-unique
seeding + MPI data parallelism, env.py:54-63); the future learner reduces
gradients with ``psum`` over this axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_env_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("env",))


def env_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("env"))


def shard_env_state(state, mesh: Mesh):
    """Place every leaf of a batched EnvState/FastState on the env mesh."""
    sh = env_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state)
