"""All three obs renderers must agree pixel-for-pixel, for all 16 games.

The repo carries three implementations of one observation contract (the
reference's draw pass, bag.cpp:819-1007, under the TPU-native sampling
semantics specified in render/oracle.py):

* ``oracle.oracle_obs``       -- per-env gather path (the readable spec)
* ``fast2.render_frames2``    -- batched one-hot-matmul path (XLA einsum)
* ``pallas_compositor``       -- VMEM-resident TPU kernel (interpret mode
                                 on CPU so CI covers it; the hardware run
                                 is tools/tpu_render_check.py)

A frame produced by any of them must be bit-identical to the others; the
static bg+grid bake is cross-checked the same way (oracle_static vs
fast2.render_static2).  Fast-signal games run in the default suite; the
rest are @slow (CI's nightly lane).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen_tpu.config import EnvConfig, DistributionMode
from procgen_tpu.engine.game import reset_env, step_env
from procgen_tpu.games import make_game, available_games
from procgen_tpu.render.pack import RenderPack
from procgen_tpu.render import fast2
from procgen_tpu.render.oracle import oracle_obs, oracle_static
from procgen_tpu.render.renderer import update_view_params
from procgen_tpu import rng as R
from procgen_tpu.state import init_state_template

# coverage by render-path class: static grid (maze), no grid (bigfish),
# grid-dynamic + color rects (chaser), grid-dynamic (miner), center-agent
# (coinrun), dynamic bg + free rotation (starpilot), center + free rotation
# (caveflyer), HUD overlay (plunder)
FAST_GAMES = [
    "maze", "bigfish", "chaser", "miner",
    "coinrun", "starpilot", "caveflyer", "plunder",
]


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


def _check_game(env_name, monkeypatch, n=2, seed=11, steps=12):
    cfg, gd, pack, states = _build_states(env_name, n, seed=seed, steps=steps)

    # static bake: batched einsum vs per-env gather spec
    static_oracle = jax.jit(
        jax.vmap(lambda s: oracle_static(gd, cfg, s, pack))
    )(states)
    np.testing.assert_array_equal(
        np.asarray(static_oracle), np.asarray(states.static_layer),
        err_msg=f"{env_name}: render_static2 diverges from oracle_static",
    )

    gather = jax.jit(jax.vmap(lambda s: oracle_obs(gd, cfg, s, pack)))(states)

    monkeypatch.setenv("PROCGEN_TPU_NO_PALLAS", "1")
    einsum = jax.jit(lambda ss: fast2.render_frames2(gd, cfg, ss, pack))(states)

    np.testing.assert_array_equal(
        np.asarray(gather), np.asarray(einsum),
        err_msg=f"{env_name}: fast2 einsum diverges from the obs oracle",
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


@pytest.mark.parametrize("env_name", FAST_GAMES)
def test_render_paths_agree(env_name, monkeypatch):
    _check_game(env_name, monkeypatch)


@pytest.mark.slow
@pytest.mark.parametrize(
    "env_name", [g for g in available_games() if g not in FAST_GAMES]
)
def test_render_paths_agree_all_games(env_name, monkeypatch):
    _check_game(env_name, monkeypatch)
