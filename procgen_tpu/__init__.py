"""procgen_tpu -- a TPU-native reimplementation of the Procgen Benchmark.

Everything (level generation, physics, rendering) runs as batched JAX programs
on TPU: env state is a pytree of arrays with a leading ``num_envs`` axis,
stepped in lockstep under ``jit`` and sharded over device meshes with
``jax.sharding`` for multi-host scale.

Reference behavior: openai/procgen (C++/Qt, CPU).  See SURVEY.md at the repo
root for the complete component map.
"""

__version__ = "0.1.0"

from procgen_tpu.config import EnvConfig, DistributionMode  # noqa: F401
