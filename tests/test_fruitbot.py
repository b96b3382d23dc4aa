"""Fruitbot levelgen conformance vs the std::mt19937 C++ oracle."""

import subprocess
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode, EnvConfig
from procgen_tpu.games import make_game
from procgen_tpu.games.fruitbot import BAD_OBJ, GOOD_OBJ
from procgen_tpu.state import init_state_template

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def fruitbot_oracle():
    src = REPO / "native" / "fruitbot_oracle.cpp"
    binary = REPO / "native" / "build" / "fruitbot_oracle"
    binary.parent.mkdir(exist_ok=True)
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O2", "-o", str(binary), str(src)], check=True)

    def run(seed: int, mode: int):
        out = subprocess.run(
            [str(binary), str(seed), str(mode)],
            check=True, capture_output=True, text=True,
        ).stdout.splitlines()
        num_good, num_bad = map(int, out[0].split()[1:])
        n_ents = int(out[1].split()[1])
        ents = []
        for line in out[2 : 2 + n_ents]:
            t = line.split()[1:]
            ents.append(
                (int(t[0]), int(t[1]))
                + tuple(float.fromhex(v) for v in t[2:6])
            )
        fp = list(map(int, out[2 + n_ents].split()[1:]))
        return {"num_good": num_good, "num_bad": num_bad, "ents": ents, "fp": fp}

    return run


@pytest.mark.parametrize(
    "mode", [DistributionMode.easy, DistributionMode.hard]
)
def test_fruitbot_levelgen_matches_oracle(fruitbot_oracle, mode):
    cfg = EnvConfig(env_name="fruitbot", num_envs=4, distribution_mode=mode)
    gd = make_game(cfg)
    tmpl = init_state_template(gd, cfg)
    seeds = [3 + 17 * i for i in range(6)]

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
        ref = fruitbot_oracle(seed, 0 if mode == DistributionMode.easy else 1)
        n_ref = len(ref["ents"])
        assert int(np.asarray(states.ents.count[i])) == n_ref, seed
        for k, (t, theme, ex, ey, erx, ery) in enumerate(ref["ents"]):
            assert int(states.ents.type[i][k]) == t, (seed, k)
            assert int(states.ents.image_theme[i][k]) == theme, (seed, k)
            got = tuple(
                float(np.asarray(getattr(states.ents, f)[i][k]))
                for f in ("x", "y")
            )
            np.testing.assert_allclose(
                got, (ex, ey), atol=2e-5, err_msg=f"seed {seed} ent {k}"
            )
            if t not in (GOOD_OBJ, BAD_OBJ):
                # good/bad rx/ry are rescaled by fit_aspect_ratio in the real
                # game (checked in test_fruitbot_fit_aspect); oracle skips it
                grx = float(np.asarray(states.ents.rx[i][k]))
                gry = float(np.asarray(states.ents.ry[i][k]))
                np.testing.assert_allclose(
                    (grx, gry), (erx, ery), atol=2e-5, err_msg=f"{seed} {k}"
                )
        # draw-count parity: next three raw draws must match the oracle's
        mt = jax.tree_util.tree_map(lambda x: x[i], states.rng)
        for want in ref["fp"]:
            mt, x = R.mt_raw(mt)
            assert int(np.uint32(np.asarray(x))) == want, seed


def test_fruitbot_fit_aspect():
    """fit_aspect_ratio (bag.cpp:1025-1036): good/bad rx/ry follow the
    per-theme sprite aspect after the theme sweep."""
    from procgen_tpu.render import assets

    cfg = EnvConfig(env_name="fruitbot", num_envs=1)
    gd = make_game(cfg)
    tmpl = init_state_template(gd, cfg)

    def one(seed):
        st = gd.choose_world_dim(cfg, tmpl)
        rs = R.mt_block_open(
            R.mt_seed(jnp.asarray(seed, jnp.int32)), gd.reset_max_draws
        )
        st, rs = gd.game_reset(cfg, st, rs)
        return st

    st = jax.jit(one)(jnp.asarray(11, jnp.int32))
    types = np.asarray(st.ents.type)
    themes = np.asarray(st.ents.image_theme)
    alive = np.asarray(st.ents.alive)
    rx = np.asarray(st.ents.rx)
    ry = np.asarray(st.ents.ry)
    from procgen_tpu.games.fruitbot import BAD_ASSETS, GOOD_ASSETS

    n_checked = 0
    for k in range(len(types)):
        if not alive[k] or types[k] not in (GOOD_OBJ, BAD_OBJ):
            continue
        names = GOOD_ASSETS if types[k] == GOOD_OBJ else BAD_ASSETS
        ar = assets.aspect_ratio(names[themes[k]])
        if ar > 1:
            assert rx[k] == np.float32(0.5)
            np.testing.assert_allclose(ry[k], 0.5 / ar, rtol=1e-6)
        else:
            assert ry[k] == np.float32(0.5)
            np.testing.assert_allclose(rx[k], 0.5 * ar, rtol=1e-6)
        n_checked += 1
    assert n_checked >= 20
