"""Chaser levelgen conformance vs the std::mt19937 C++ oracle."""

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
def chaser_oracle():
    src = REPO / "native" / "chaser_oracle.cpp"
    binary = REPO / "native" / "build" / "chaser_oracle"
    binary.parent.mkdir(exist_ok=True)
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O2", "-o", str(binary), str(src)], check=True)

    def run(seed: int, mode: int):
        md = {0: 11, 1: 13, 2: 19}[mode]
        out = subprocess.run(
            [str(binary), str(seed), str(mode)],
            check=True, capture_output=True, text=True,
        ).stdout.splitlines()
        total_orbs, extra_quad = map(int, out[0].split()[1:])
        ax, ay = (float.fromhex(t) for t in out[1].split()[1:])
        rows = [list(map(int, l.split())) for l in out[2 : 2 + md]]
        n_ents = int(out[2 + md].split()[1])
        ents = []
        for line in out[3 + md : 3 + md + n_ents]:
            t = line.split()[1:]
            ents.append((int(t[0]), float.fromhex(t[1]), float.fromhex(t[2])))
        fp = list(map(int, out[3 + md + n_ents].split()[1:]))
        return {
            "total_orbs": total_orbs, "agent": (ax, ay),
            "grid": np.asarray(rows), "ents": ents, "fp": fp,
        }

    return run


@pytest.mark.parametrize(
    "mode",
    [DistributionMode.easy, DistributionMode.hard, DistributionMode.extreme],
)
def test_chaser_levelgen_matches_oracle(chaser_oracle, mode):
    cfg = EnvConfig(env_name="chaser", num_envs=4, distribution_mode=mode)
    gd = make_game(cfg)
    tmpl = init_state_template(gd, cfg)
    seeds = [5 + 31 * i for i in range(6)]

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
        ref = chaser_oracle(seed, int(mode))
        np.testing.assert_array_equal(
            np.asarray(states.grid[i]), ref["grid"], err_msg=f"seed {seed}"
        )
        assert int(states.extra["total_orbs"][i]) == ref["total_orbs"]
        ax = float(np.asarray(states.ents.x[i][0]))
        ay = float(np.asarray(states.ents.y[i][0]))
        assert (ax, ay) == ref["agent"], seed
        for k, (t, ex, ey) in enumerate(ref["ents"]):
            slot = k + 1
            assert int(states.ents.type[i][slot]) == t, (seed, k)
            assert float(np.asarray(states.ents.x[i][slot])) == ex, (seed, k)
            assert float(np.asarray(states.ents.y[i][slot])) == ey, (seed, k)
        assert int(np.asarray(states.ents.count[i])) == 1 + len(ref["ents"])
        mt = jax.tree_util.tree_map(lambda x: x[i], states.rng)
        for want in ref["fp"]:
            mt, x = R.mt_raw(mt)
            assert int(np.uint32(np.asarray(x))) == want, seed
