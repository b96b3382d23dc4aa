"""Ninja levelgen conformance vs the std::mt19937 C++ oracle."""

import subprocess
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode, EnvConfig
from procgen_tpu.games import make_game
from procgen_tpu.state import init_state_template

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def ninja_oracle():
    src = REPO / "native" / "ninja_oracle.cpp"
    binary = REPO / "native" / "build" / "ninja_oracle"
    binary.parent.mkdir(exist_ok=True)
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O2", "-o", str(binary), str(src)], check=True)

    def run(seed: int, mode: int):
        out = subprocess.run(
            [str(binary), str(seed), str(mode)],
            check=True, capture_output=True, text=True,
        ).stdout.splitlines()
        toks = out[0].split()[1:]
        difficulty, wall_theme, goal_theme = map(int, toks[:3])
        goal_x, goal_y = (float.fromhex(v) for v in toks[3:5])
        rows = [list(map(int, l.split())) for l in out[1:65]]
        fp = list(map(int, out[65].split()[1:]))
        return {
            "wall_theme": wall_theme, "goal_theme": goal_theme,
            "goal": (goal_x, goal_y), "grid": np.asarray(rows), "fp": fp,
        }

    return run


@pytest.mark.parametrize(
    "mode", [DistributionMode.easy, DistributionMode.hard]
)
def test_ninja_levelgen_matches_oracle(ninja_oracle, mode):
    cfg = EnvConfig(env_name="ninja", num_envs=4, distribution_mode=mode)
    gd = make_game(cfg)
    tmpl = init_state_template(gd, cfg)
    seeds = [4 + 37 * i for i in range(6)]

    def one(seed):
        st = gd.choose_world_dim(cfg, tmpl)
        rs = R.mt_block_open(
            R.mt_seed(jnp.asarray(seed, jnp.int32)), gd.reset_max_draws
        )
        st, rs = gd.game_reset(cfg, st, rs)
        return st.replace(rng=R.mt_block_close(rs)), R.blk_overflowed(rs)

    states, overflowed = jax.jit(jax.vmap(one))(jnp.asarray(seeds, jnp.int32))
    assert not np.asarray(overflowed).any()

    for i, seed in enumerate(seeds):
        ref = ninja_oracle(seed, int(mode == DistributionMode.hard))
        np.testing.assert_array_equal(
            np.asarray(states.grid[i]), ref["grid"], err_msg=f"seed {seed}"
        )
        assert int(states.extra["wall_theme"][i]) == ref["wall_theme"], seed
        # goal is entity slot 1
        assert int(states.ents.type[i][1]) == 1, seed
        assert int(states.ents.image_theme[i][1]) == ref["goal_theme"], seed
        assert float(np.asarray(states.ents.x[i][1])) == ref["goal"][0], seed
        assert float(np.asarray(states.ents.y[i][1])) == ref["goal"][1], seed
        mt = jax.tree_util.tree_map(lambda x: x[i], states.rng)
        for want in ref["fp"]:
            mt, x = R.mt_raw(mt)
            assert int(np.uint32(np.asarray(x))) == want, seed
