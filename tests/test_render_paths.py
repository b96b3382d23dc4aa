"""All three renderers must agree pixel-for-pixel.

The repo carries three compositing paths for the same draw semantics
(bag.cpp:819-1007 world->screen transform, z-ordered nearest-sampled
sprite blending):

* ``renderer.render_env``     -- per-env gather path (the readable oracle)
* ``fast2.render_frames2``    -- batched one-hot-matmul path (XLA einsum)
* ``pallas_compositor``       -- VMEM-resident TPU kernel (interpret mode
                                 on CPU so CI covers it)

A frame produced by any of them must be bit-identical to the others; this
locks the fast paths to the gather oracle per game (VERDICT r2 item 8).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen_tpu.config import EnvConfig, DistributionMode
from procgen_tpu.engine.game import reset_env, step_env
from procgen_tpu.games import make_game, available_games
from procgen_tpu.render.pack import RenderPack
from procgen_tpu.render import fast2
from procgen_tpu.render.renderer import render_env, update_view_params
from procgen_tpu import rng as R
from procgen_tpu.state import init_state_template

FAST_GAMES = ["maze", "bigfish", "chaser", "plunder", "leaper", "miner"]


def _build_states(env_name, n, seed, steps):
    cfg = EnvConfig(
        env_name=env_name,
        num_envs=n,
        distribution_mode=DistributionMode.easy,
        rand_seed=seed,
    )
    gd = make_game(cfg)
    pack = RenderPack(gd, cfg)
    tmpl = init_state_template(gd, cfg)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), tmpl
    )
    master = R.HostMT(seed)
    seeds = jnp.asarray([master.randint_full() for _ in range(n)], jnp.int32)
    batched = batched.replace(level_seed_rng=R.mt_seed(seeds))
    states = jax.jit(
        jax.vmap(lambda s: update_view_params(gd, cfg, reset_env(gd, cfg, s)))
    )(batched)
    step = jax.jit(
        jax.vmap(lambda s, a: update_view_params(gd, cfg, step_env(gd, cfg, s, a)))
    )
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        states = step(states, jnp.asarray(rng.randint(0, 15, size=n), jnp.int32))
    states = states.replace(
        static_layer=fast2.render_static2(gd, cfg, states, pack)
    )
    return cfg, gd, pack, states


@pytest.mark.parametrize("env_name", FAST_GAMES)
def test_fast2_matches_gather_and_pallas(env_name, monkeypatch):
    n = 2
    cfg, gd, pack, states = _build_states(env_name, n, seed=11, steps=12)

    gather = jax.jit(jax.vmap(lambda s: render_env(gd, cfg, s, pack)))(states)

    monkeypatch.setenv("PROCGEN_TPU_NO_PALLAS", "1")
    einsum = jax.jit(lambda ss: fast2.render_frames2(gd, cfg, ss, pack))(states)

    np.testing.assert_array_equal(
        np.asarray(gather), np.asarray(einsum),
        err_msg=f"{env_name}: fast2 einsum diverges from gather oracle",
    )

    # pallas kernel in interpret mode (CPU); force the TPU dispatch branch
    monkeypatch.delenv("PROCGEN_TPU_NO_PALLAS")
    monkeypatch.setenv("PROCGEN_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(fast2, "_use_pallas", lambda: True)
    import procgen_tpu.render.pallas_compositor as pc
    pc._build_call.cache_clear()
    pallas = jax.jit(lambda ss: fast2.render_frames2(gd, cfg, ss, pack))(states)
    pc._build_call.cache_clear()

    np.testing.assert_array_equal(
        np.asarray(einsum), np.asarray(pallas),
        err_msg=f"{env_name}: pallas kernel diverges from einsum path",
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "env_name", [g for g in available_games() if g not in FAST_GAMES]
)
def test_fast2_matches_gather_all_games(env_name, monkeypatch):
    n = 2
    cfg, gd, pack, states = _build_states(env_name, n, seed=11, steps=12)
    gather = jax.jit(jax.vmap(lambda s: render_env(gd, cfg, s, pack)))(states)
    monkeypatch.setenv("PROCGEN_TPU_NO_PALLAS", "1")
    einsum = jax.jit(lambda ss: fast2.render_frames2(gd, cfg, ss, pack))(states)
    np.testing.assert_array_equal(
        np.asarray(gather), np.asarray(einsum),
        err_msg=f"{env_name}: fast2 einsum diverges from gather oracle",
    )
