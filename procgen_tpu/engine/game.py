"""Episode loop: Game::step / Game::reset equivalents (game.cpp:93-165).

``step_env``/``reset_env`` are per-env pure functions, lifted over the env
axis by the env wrapper with vmap.  Auto-reset is inline here (levelgen traced
into the step, masked per env) -- the exact-but-slow path used by tests and
small batches.  The high-throughput path (pregenerated level queue swapped in
at done, refilled between scan chunks) lives in procgen_tpu/env.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import rng as R
from procgen_tpu.state import F32, I32, EnvState

INT32_997 = np.int32(997)


def reset_env(gd, cfg, state: EnvState) -> EnvState:
    """Game::reset (game.cpp:93-118)."""
    er0 = state.episodes_remaining == 0
    seq_keep = jnp.logical_and(
        bool(cfg.use_sequential_levels), state.level_complete
    )
    # sequential path: wrapping int32 add (game.cpp:97-100)
    seed_seq = state.current_level_seed + INT32_997
    lrng, drawn = R.mt_randint(
        state.level_seed_rng,
        cfg.level_seed_low,
        cfg.level_seed_high,
        active=jnp.logical_and(er0, ~seq_keep),
    )
    new_seed = jnp.where(
        er0, jnp.where(seq_keep, seed_seq, drawn), state.current_level_seed
    )
    # else-branch bookkeeping (game.cpp:105-109); unreachable in practice
    # because episodes_remaining is always 0 at reset, kept for fidelity.
    reward = jnp.where(er0, state.reward, F32(0.0))
    done = jnp.where(er0, state.done, False)
    level_complete = jnp.where(er0, state.level_complete, False)

    state = state.replace(
        level_seed_rng=lrng,
        current_level_seed=new_seed,
        episodes_remaining=jnp.where(er0, 1, state.episodes_remaining),
        reward=reward,
        done=done,
        level_complete=level_complete,
    )
    # Level generation draws through a prefetched block: one twist chain for
    # the whole levelgen instead of a conditional twist per draw.
    rs = R.mt_block_open(R.mt_seed(new_seed), gd.reset_max_draws)
    state, rs = gd.game_reset(cfg, state, rs)
    state = state.replace(rng=R.mt_block_close(rs))
    return state.replace(
        cur_time=jnp.asarray(0, I32),
        episodes_remaining=state.episodes_remaining - 1,
        action=jnp.asarray(gd.default_action, I32),
    )


def step_env_no_reset(gd, cfg, state: EnvState, action) -> EnvState:
    """Game::step (game.cpp:120-143) *without* the auto-reset: when done the
    returned state is the finished episode's final state.  The caller must
    swap in a new level before the next step (inline reset or level queue)."""
    action = jnp.asarray(action, I32)
    cur_time = state.cur_time + 1
    force = action == -1
    action = jnp.where(force, gd.default_action, action)

    state = state.replace(
        cur_time=cur_time,
        action=action,
        reward=F32(0.0),
        done=jnp.asarray(False),
        level_complete=jnp.asarray(False),
    )
    state = gd.game_step(cfg, state)

    done = state.done | force | (cur_time >= state.timeout)
    reward = state.reward
    return state.replace(
        done=done,
        last_reward_timer=jnp.where(reward != 0, 10, state.last_reward_timer),
        last_reward=jnp.where(reward != 0, reward, state.last_reward),
        prev_level_seed=state.current_level_seed,
    )


def finish_step(cfg, state: EnvState) -> EnvState:
    """Post-reset step epilogue (game.cpp:148-153): sequential-levels
    chaining hides the done, then episode_done is latched."""
    if cfg.use_sequential_levels:
        state = state.replace(
            done=jnp.where(state.level_complete, False, state.done)
        )
    return state.replace(episode_done=state.done)


def step_env(gd, cfg, state: EnvState, action) -> EnvState:
    """Game::step (game.cpp:120-155) with inline masked auto-reset.

    The returned state's ``reward``/``done`` (episode_done) are the step
    outputs; when done, the state already holds the next level (the obs
    rendered from it is the new episode's first frame, as in the reference).
    """
    state = step_env_no_reset(gd, cfg, state, action)

    # Auto-reset (game.cpp:144-146): inline levelgen, masked per env.
    reset_state = reset_env(gd, cfg, state)
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(state.done, a, b), reset_state, state
    )
    return finish_step(cfg, state)
