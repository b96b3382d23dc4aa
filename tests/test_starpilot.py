"""Starpilot spawner-timeline conformance vs the std::mt19937 C++ oracle."""

import subprocess
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode, EnvConfig
from procgen_tpu.games import make_game
from procgen_tpu.games.starpilot import SPAWNER_FIELDS, TURRET_ASSETS
from procgen_tpu.render.assets import aspect_ratio
from procgen_tpu.state import init_state_template

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def starpilot_oracle():
    src = REPO / "native" / "starpilot_oracle.cpp"
    binary = REPO / "native" / "build" / "starpilot_oracle"
    binary.parent.mkdir(exist_ok=True)
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O2", "-o", str(binary), str(src)], check=True)
    aspects = [
        float(np.float32(aspect_ratio(n))).hex() for n in TURRET_ASSETS
    ]

    def run(seed: int, mode: int):
        out = subprocess.run(
            [str(binary), str(seed), str(mode)] + aspects,
            check=True, capture_output=True, text=True,
        ).stdout.splitlines()
        n = int(out[0].split()[1])
        sps = []
        for line in out[1 : 1 + n]:
            tk = line.split()[1:]
            sps.append(
                dict(
                    type=int(tk[0]), image_theme=int(tk[1]),
                    render_z=int(tk[2]), fire_time=int(tk[3]),
                    spawn_time=int(tk[4]),
                    **{
                        f: float.fromhex(v)
                        for f, v in zip(
                            ("x", "y", "vx", "vy", "rx", "ry", "health",
                             "rotation"),
                            tk[5:13],
                        )
                    },
                )
            )
        fp = list(map(int, out[1 + n].split()[1:]))
        return {"spawners": sps, "fp": fp}

    return run


MODES = [
    (DistributionMode.easy, 0),
    (DistributionMode.hard, 1),
    (DistributionMode.extreme, 2),
]


@pytest.mark.parametrize("mode,mode_i", MODES)
def test_starpilot_spawners_match_oracle(starpilot_oracle, mode, mode_i):
    cfg = EnvConfig(env_name="starpilot", num_envs=4, distribution_mode=mode)
    gd = make_game(cfg)
    tmpl = init_state_template(gd, cfg)
    seeds = [14 + 27 * i for i in range(5)]

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
        ref = starpilot_oracle(seed, mode_i)
        n = len(ref["spawners"])
        assert int(states.extra["sp_count"][i]) == n, seed
        for k, sp in enumerate(ref["spawners"]):
            for f in ("type", "image_theme", "render_z", "fire_time",
                      "spawn_time"):
                got = int(states.extra[f"sp_{f}"][i][k])
                assert got == sp[f], (seed, k, f, got, sp[f])
            for f in ("x", "y", "vx", "vy", "rx", "ry", "health", "rotation"):
                got = float(np.asarray(states.extra[f"sp_{f}"][i][k]))
                np.testing.assert_allclose(
                    got, sp[f], atol=2e-6, err_msg=f"seed {seed} sp {k} {f}"
                )
        mt = jax.tree_util.tree_map(lambda x: x[i], states.rng)
        for want in ref["fp"]:
            mt, x = R.mt_raw(mt)
            assert int(np.uint32(np.asarray(x))) == want, seed
