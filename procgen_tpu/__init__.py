"""procgen_tpu -- a TPU-native reimplementation of the Procgen Benchmark.

Everything (level generation, physics, rendering) runs as batched JAX programs
on TPU: env state is a pytree of arrays with a leading ``num_envs`` axis,
stepped in lockstep under ``jit`` and sharded over device meshes with
``jax.sharding`` for multi-host scale.

Reference behavior: openai/procgen (C++/Qt, CPU).  See SURVEY.md at the repo
root for the complete component map.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compile cache (opt out with PROCGEN_TPU_COMPILE_CACHE=0).
# The per-game reset/step graphs are large; caching turns minutes of
# recompilation into milliseconds across processes.
if _os.environ.get("PROCGEN_TPU_COMPILE_CACHE", "1") != "0":
    import jax as _jax

    _cache_dir = _os.environ.get(
        "PROCGEN_TPU_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".jax_cache"),
    )
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from procgen_tpu.config import EnvConfig, DistributionMode  # noqa: F401
