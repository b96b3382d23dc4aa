"""Bossfight levelgen conformance vs the std::mt19937 C++ oracle."""

import subprocess
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode, EnvConfig
from procgen_tpu.games import make_game
from procgen_tpu.games.bossfight import (
    BARRIER_ASSETS,
    BOSS_ASSETS,
    PLAYER_ASSETS,
)
from procgen_tpu.render.assets import aspect_ratio
from procgen_tpu.state import init_state_template

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def bossfight_oracle():
    src = REPO / "native" / "bossfight_oracle.cpp"
    binary = REPO / "native" / "build" / "bossfight_oracle"
    binary.parent.mkdir(exist_ok=True)
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O2", "-o", str(binary), str(src)], check=True)
    aspects = [
        float(np.float32(aspect_ratio(n))).hex()
        for n in list(PLAYER_ASSETS) + list(BOSS_ASSETS) + list(BARRIER_ASSETS)
    ]

    def run(seed: int, mode: int):
        out = subprocess.run(
            [str(binary), str(seed), str(mode)] + aspects,
            check=True, capture_output=True, text=True,
        ).stdout.splitlines()
        meta = list(map(int, out[0].split()[1:]))
        modes = list(map(int, out[1].split()[1:]))
        n_ents = int(out[2].split()[1])
        ents = []
        for line in out[3 : 3 + n_ents]:
            t = line.split()[1:]
            ents.append(
                (int(t[0]), int(t[1]))
                + tuple(float.fromhex(v) for v in t[2:6])
            )
        fp = list(map(int, out[3 + n_ents].split()[1:]))
        keys = (
            "boss_theme round_health num_rounds invulnerable_duration "
            "boss_health agent_theme player_laser_theme boss_laser_theme "
            "barriers_moves_right"
        ).split()
        return {**dict(zip(keys, meta)), "modes": modes, "ents": ents, "fp": fp}

    return run


@pytest.mark.parametrize(
    "mode", [DistributionMode.easy, DistributionMode.hard]
)
def test_bossfight_levelgen_matches_oracle(bossfight_oracle, mode):
    cfg = EnvConfig(env_name="bossfight", num_envs=4, distribution_mode=mode)
    gd = make_game(cfg)
    tmpl = init_state_template(gd, cfg)
    seeds = [9 + 23 * i for i in range(6)]

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
        ref = bossfight_oracle(seed, int(mode == DistributionMode.hard))
        ex = {k: np.asarray(v[i]) for k, v in states.extra.items()}
        assert int(ex["round_health"]) == ref["round_health"], seed
        assert int(ex["num_rounds"]) == ref["num_rounds"], seed
        assert int(ex["invulnerable_duration"]) == ref["invulnerable_duration"]
        assert int(ex["player_laser_theme"]) == ref["player_laser_theme"]
        assert int(ex["boss_laser_theme"]) == ref["boss_laser_theme"]
        assert bool(ex["barriers_moves_right"]) == bool(
            ref["barriers_moves_right"]
        ), seed
        np.testing.assert_array_equal(
            ex["attack_modes"][: ref["num_rounds"]], ref["modes"], seed
        )
        assert bool(ex["shields_are_up"])
        assert int(ex["attack_mode"]) == ref["modes"][0]
        assert float(np.asarray(states.ents.health[i][1])) == ref["boss_health"]
        assert int(np.asarray(states.ents.count[i])) == len(ref["ents"]), seed
        for k, (t, theme, exx, eyy, erx, ery) in enumerate(ref["ents"]):
            assert int(states.ents.type[i][k]) == t, (seed, k)
            if t != 3:  # shields carry no theme
                assert int(states.ents.image_theme[i][k]) == theme, (seed, k)
            got = tuple(
                float(np.asarray(getattr(states.ents, f)[i][k]))
                for f in ("x", "y", "rx", "ry")
            )
            np.testing.assert_allclose(
                got, (exx, eyy, erx, ery), atol=2e-5,
                err_msg=f"seed {seed} ent {k}",
            )
        mt = jax.tree_util.tree_map(lambda x: x[i], states.rng)
        for want in ref["fp"]:
            mt, x = R.mt_raw(mt)
            assert int(np.uint32(np.asarray(x))) == want, seed
