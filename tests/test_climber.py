"""Climber levelgen conformance vs the std::mt19937 C++ oracle."""

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
def climber_oracle():
    src = REPO / "native" / "climber_oracle.cpp"
    binary = REPO / "native" / "build" / "climber_oracle"
    binary.parent.mkdir(exist_ok=True)
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O2", "-o", str(binary), str(src)], check=True)

    def run(seed: int, mode: int):
        mw = 16 if mode == 0 else 20
        out = subprocess.run(
            [str(binary), str(seed), str(mode)],
            check=True, capture_output=True, text=True,
        ).stdout.splitlines()
        agent_theme, wall_theme, num_platforms, coin_quota, n_ents = map(
            int, out[0].split()[1:]
        )
        rows = [list(map(int, l.split())) for l in out[1:65]]
        ents = []
        for line in out[65 : 65 + n_ents]:
            t = line.split()[1:]
            ents.append((int(t[0]),) + tuple(float.fromhex(v) for v in t[1:4]))
        fp = list(map(int, out[65 + n_ents].split()[1:]))
        return {
            "agent_theme": agent_theme, "wall_theme": wall_theme,
            "coin_quota": coin_quota, "grid": np.asarray(rows), "ents": ents,
            "fp": fp,
        }

    return run


@pytest.mark.parametrize(
    "mode", [DistributionMode.easy, DistributionMode.hard]
)
def test_climber_levelgen_matches_oracle(climber_oracle, mode):
    cfg = EnvConfig(env_name="climber", num_envs=4, distribution_mode=mode)
    gd = make_game(cfg)
    tmpl = init_state_template(gd, cfg)
    seeds = [2 + 29 * i for i in range(6)]

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
        ref = climber_oracle(seed, int(mode == DistributionMode.hard))
        np.testing.assert_array_equal(
            np.asarray(states.grid[i]), ref["grid"], err_msg=f"seed {seed}"
        )
        assert int(states.ents.image_theme[i][0]) == ref["agent_theme"]
        assert int(states.extra["wall_theme"][i]) == ref["wall_theme"], seed
        assert int(states.extra["coin_quota"][i]) == ref["coin_quota"], seed
        assert int(np.asarray(states.ents.count[i])) == len(ref["ents"]), seed
        for k, (t, exx, eyy, evx) in enumerate(ref["ents"]):
            assert int(states.ents.type[i][k]) == t, (seed, k)
            got = tuple(
                float(np.asarray(getattr(states.ents, f)[i][k]))
                for f in ("x", "y", "vx")
            )
            np.testing.assert_allclose(
                got, (exx, eyy, evx), atol=1e-6, err_msg=f"seed {seed} ent {k}"
            )
        mt = jax.tree_util.tree_map(lambda x: x[i], states.rng)
        for want in ref["fp"]:
            mt, x = R.mt_raw(mt)
            assert int(np.uint32(np.asarray(x))) == want, seed
