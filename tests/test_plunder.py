"""Plunder levelgen conformance vs the std::mt19937 C++ oracle."""

import subprocess
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode, EnvConfig
from procgen_tpu.games import make_game
from procgen_tpu.render.assets import aspect_ratio
from procgen_tpu.state import init_state_template

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def plunder_oracle():
    src = REPO / "native" / "plunder_oracle.cpp"
    binary = REPO / "native" / "build" / "plunder_oracle"
    binary.parent.mkdir(exist_ok=True)
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O2", "-o", str(binary), str(src)], check=True)
    aspect = float(np.float32(aspect_ratio("misc_assets/ship_1.png")))

    def run(seed: int, mode: int):
        out = subprocess.run(
            [str(binary), str(seed), str(mode), aspect.hex()],
            check=True, capture_output=True, text=True,
        ).stdout.splitlines()
        num_panels, agent_theme, n_ents = map(int, out[0].split()[1:])
        perm = list(map(int, out[1].split()[1:]))
        lanes = list(map(int, out[2].split()[1:]))
        vels = [float.fromhex(v) for v in out[3].split()[1:]]
        ents = []
        for line in out[4 : 4 + n_ents]:
            t = line.split()[1:]
            ents.append(
                (int(t[0]), int(t[1]))
                + tuple(float.fromhex(v) for v in t[2:6])
            )
        fp = list(map(int, out[4 + n_ents].split()[1:]))
        return {
            "num_panels": num_panels, "agent_theme": agent_theme,
            "perm": perm, "lanes": lanes, "vels": vels, "ents": ents, "fp": fp,
        }

    return run


@pytest.mark.parametrize(
    "mode", [DistributionMode.easy, DistributionMode.hard]
)
def test_plunder_levelgen_matches_oracle(plunder_oracle, mode):
    cfg = EnvConfig(env_name="plunder", num_envs=4, distribution_mode=mode)
    gd = make_game(cfg)
    tmpl = init_state_template(gd, cfg)
    seeds = [7 + 13 * i for i in range(6)]

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
        ref = plunder_oracle(seed, int(mode == DistributionMode.hard))
        np.testing.assert_array_equal(
            np.asarray(states.extra["image_permutation"][i]), ref["perm"], seed
        )
        np.testing.assert_array_equal(
            np.asarray(states.extra["lane_directions"][i]).astype(int),
            ref["lanes"], seed,
        )
        np.testing.assert_allclose(
            np.asarray(states.extra["lane_vels"][i]), ref["vels"], atol=2e-6
        )
        tb = np.zeros(6, bool)
        tb[ref["perm"][0]] = True
        np.testing.assert_array_equal(
            np.asarray(states.extra["target_bools"][i]), tb, seed
        )
        assert int(np.asarray(states.ents.count[i])) == len(ref["ents"])
        for k, (t, theme, ex, ey, erx, ery) in enumerate(ref["ents"]):
            assert int(states.ents.type[i][k]) == t, (seed, k)
            if t in (2, 7, 0):  # legend/ship/agent carry ship themes
                assert int(states.ents.image_theme[i][k]) == theme, (seed, k)
            got = tuple(
                float(np.asarray(getattr(states.ents, f)[i][k]))
                for f in ("x", "y", "rx", "ry")
            )
            np.testing.assert_allclose(
                got, (ex, ey, erx, ery), atol=2e-5,
                err_msg=f"seed {seed} ent {k}",
            )
        mt = jax.tree_util.tree_map(lambda x: x[i], states.rng)
        for want in ref["fp"]:
            mt, x = R.mt_raw(mt)
            assert int(np.uint32(np.asarray(x))) == want, seed
