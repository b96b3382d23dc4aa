"""The queue-based fast path must be bit-identical to the inline-reset path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen_tpu.config import EnvConfig, DistributionMode
from procgen_tpu.engine.game import reset_env, step_env
from procgen_tpu.games import make_game
from procgen_tpu.parallel.fast import make_fast_fns
from procgen_tpu.render.renderer import update_view_params
from procgen_tpu import rng as R
from procgen_tpu.state import init_state_template


def build(env_name, n, seed):
    cfg = EnvConfig(
        env_name=env_name,
        num_envs=n,
        distribution_mode=DistributionMode.easy,
        rand_seed=seed,
    )
    gd = make_game(cfg)
    tmpl = init_state_template(gd, cfg)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), tmpl
    )
    master = R.HostMT(seed)
    seeds = jnp.asarray([master.randint_full() for _ in range(n)], jnp.int32)
    batched = batched.replace(level_seed_rng=R.mt_seed(seeds))
    return cfg, gd, batched


@pytest.mark.parametrize("env_name,steps", [("maze", 250), ("bigfish", 120), ("miner", 100), ("leaper", 80)])
def test_fast_path_matches_inline(env_name, steps):
    n = 4
    cfg, gd, init_state = build(env_name, n, seed=31)

    inline_step = jax.jit(
        jax.vmap(
            lambda s, a: update_view_params(gd, cfg, step_env(gd, cfg, s, a))
        )
    )
    reset_all = jax.jit(
        jax.vmap(lambda s: update_view_params(gd, cfg, reset_env(gd, cfg, s)))
    )
    from procgen_tpu.render.pack import RenderPack
    pack = RenderPack(gd, cfg)
    fast_init, fast_step = make_fast_fns(gd, cfg, pack, refill_bucket=2)
    fast_init = jax.jit(fast_init)
    fast_step = jax.jit(fast_step)

    s_inline = reset_all(init_state)
    fs = fast_init(s_inline)

    rng = np.random.RandomState(7)
    checked_resets = 0
    for t in range(steps):
        if t in (40, 41, 90):  # forced resets (action -1) exercise the queue
            acts = jnp.full((n,), -1, jnp.int32)
        else:
            acts = jnp.asarray(rng.randint(0, 15, size=n), jnp.int32)
        s_inline = inline_step(s_inline, acts)
        fs = fast_step(fs, acts)
        if bool(jnp.any(s_inline.done)):
            checked_resets += 1
        for field in (
            "reward", "done", "level_complete", "cur_time",
            "current_level_seed", "prev_level_seed", "episode_done",
        ):
            np.testing.assert_array_equal(
                np.asarray(getattr(s_inline, field)),
                np.asarray(getattr(fs.state, field)),
                err_msg=f"{field} diverged at step {t}",
            )
        np.testing.assert_array_equal(
            np.asarray(s_inline.ents.x), np.asarray(fs.state.ents.x),
            err_msg=f"entity x diverged at step {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(s_inline.rng.pos), np.asarray(fs.state.rng.pos),
            err_msg=f"rng pos diverged at step {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(s_inline.grid), np.asarray(fs.state.grid),
            err_msg=f"grid diverged at step {t}",
        )

    # the forced resets guarantee the queue path was exercised
    assert checked_resets >= 3
