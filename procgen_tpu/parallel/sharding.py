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


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> Mesh:
    """Multi-host entry: initialize jax.distributed and return the global
    env mesh over every chip in the slice.

    Each host then builds ITS shard of the env batch (num_envs //
    process_count envs, seeded rank-uniquely -- see
    ``rank_unique_seed``, the reference's mpi4py rank offsetting at
    env.py:54-63) and assembles a global array with
    ``jax.make_array_from_process_local_data``. Collectives ride ICI within
    the slice; the learner's gradient psum is inserted by XLA from the
    replicated-param / sharded-batch layout.
    """
    if jax.process_count() == 1 and coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return make_env_mesh()


def rank_unique_seed(rand_seed: int, process_id: int | None = None) -> int:
    """Reference env.py:54-63: make the seed unique per rank so hosts
    generate disjoint level streams."""
    pid = jax.process_index() if process_id is None else process_id
    return (rand_seed + 31 * pid) % (2**31 - 1)


def host_env_slice(num_envs_global: int) -> tuple[int, int]:
    """(start, count) of this host's env shard (env axis split evenly
    over processes, matching NamedSharding(P('env')) layout)."""
    n = jax.process_count()
    assert num_envs_global % n == 0, (num_envs_global, n)
    per = num_envs_global // n
    return jax.process_index() * per, per


def make_global_env_state(local_state, mesh: Mesh):
    """Assemble a global sharded EnvState from per-host local shards
    (multi-host path; single-host reduces to device_put)."""
    sh = env_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), local_state
        )
    import numpy as np  # local import: host-side staging

    def to_global(x):
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sh, np.asarray(x), global_shape
        )

    return jax.tree_util.tree_map(to_global, local_state)
