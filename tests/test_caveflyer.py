"""Caveflyer levelgen conformance vs the std::mt19937 C++ oracle."""

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
def caveflyer_oracle():
    src = REPO / "native" / "caveflyer_oracle.cpp"
    binary = REPO / "native" / "build" / "caveflyer_oracle"
    binary.parent.mkdir(exist_ok=True)
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-o", str(binary), str(src)],
            check=True,
        )

    def run(seed: int, mode: int):
        W = {0: 30, 1: 40, 3: 60}[mode]
        out = subprocess.run(
            [str(binary), str(seed), str(mode)],
            check=True, capture_output=True, text=True,
        ).stdout.splitlines()
        num_objs, n_ents = map(int, out[0].split()[1:])
        rows = [list(map(int, l.split())) for l in out[1 : 1 + W]]
        ents = []
        for line in out[1 + W : 1 + W + n_ents]:
            t = line.split()[1:]
            ents.append((int(t[0]),) + tuple(float.fromhex(v) for v in t[1:5]))
        fp = list(map(int, out[1 + W + n_ents].split()[1:]))
        return {"num_objs": num_objs, "grid": np.asarray(rows), "ents": ents, "fp": fp}

    return run


MODES = [
    (DistributionMode.easy, 0),
    (DistributionMode.hard, 1),
    (DistributionMode.memory, 3),
]


@pytest.mark.parametrize("mode,mode_i", MODES)
def test_caveflyer_levelgen_matches_oracle(caveflyer_oracle, mode, mode_i):
    cfg = EnvConfig(env_name="caveflyer", num_envs=3, distribution_mode=mode)
    gd = make_game(cfg)
    tmpl = init_state_template(gd, cfg)
    seeds = [8 + 19 * i for i in range(3)]

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
        ref = caveflyer_oracle(seed, mode_i)
        np.testing.assert_array_equal(
            np.asarray(states.grid[i]), ref["grid"], err_msg=f"seed {seed}"
        )
        assert int(np.asarray(states.ents.count[i])) == len(ref["ents"]), seed
        for k, (t, exx, eyy, evx, evy) in enumerate(ref["ents"]):
            assert int(states.ents.type[i][k]) == t, (seed, k)
            got = tuple(
                float(np.asarray(getattr(states.ents, f)[i][k]))
                for f in ("x", "y", "vx", "vy")
            )
            np.testing.assert_allclose(
                got, (exx, eyy, evx, evy), atol=1e-6,
                err_msg=f"seed {seed} ent {k}",
            )
        mt = jax.tree_util.tree_map(lambda x: x[i], states.rng)
        for want in ref["fp"]:
            mt, x = R.mt_raw(mt)
            assert int(np.uint32(np.asarray(x))) == want, seed
