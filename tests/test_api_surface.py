"""API-surface parity: combos, joint env, render_mode, gym registry,
interactive autoplay (reference env.py / gym_registration.py /
interactive.py equivalents)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from procgen_tpu.env import ProcgenTPUEnv, make_procgen_env

REPO = Path(__file__).resolve().parent.parent


def test_combos_and_keys_to_act():
    env = ProcgenTPUEnv(num=1, env_name="maze", rand_seed=1, distribution_mode="easy", render=False)
    combos = env.get_combos()
    assert len(combos) == 15
    assert combos[4] == ()  # noop is action 4
    acts = env.keys_to_act([
        ["LEFT"], ["LEFT", "UP"], ["D"], [], ["RIGHT", "DOWN", "LEFT"]
    ])
    assert int(acts[0][0]) == 1
    assert int(acts[1][0]) == 2
    assert int(acts[2][0]) == 9
    assert int(acts[3][0]) == 4  # empty keys -> noop combo matches
    # longest match wins; ties keep the first combo scanned (LEFT+DOWN = 0)
    assert int(acts[4][0]) == 0


def test_joint_env_game_interleave():
    env = make_procgen_env(
        4, "maze,bigfish", rand_seed=5, distribution_mode="easy"
    )
    rew, ob, first = env.observe()
    assert ob["rgb"].shape == (4, 64, 64, 3)
    rng = np.random.RandomState(0)
    for _ in range(5):
        env.act(rng.randint(0, 15, size=4))
        env.observe()
    blobs = env.get_state()
    assert len(blobs) == 4
    # game name is embedded in each state blob header: maze at 0/2, bigfish 1/3
    assert b"maze" in blobs[0] and b"maze" in blobs[2]
    assert b"bigfish" in blobs[1] and b"bigfish" in blobs[3]
    env.set_state(blobs)


def test_joint_env_divisibility():
    with pytest.raises(ValueError):
        make_procgen_env(3, "maze,bigfish", distribution_mode="easy")


def test_render_mode_hires_info():
    env = ProcgenTPUEnv(
        num=2, env_name="maze", rand_seed=3, distribution_mode="easy",
        render_mode="rgb_array",
    )
    env.act(np.zeros(2, dtype=np.int32))
    infos = env.get_info()
    assert infos[0]["rgb"].shape == (512, 512, 3)
    assert infos[0]["rgb"].dtype == np.uint8
    assert (infos[0]["rgb"] > 0).mean() > 0.5


def test_gym_registration():
    gym = pytest.importorskip("gym")
    from procgen_tpu.gym_adapters import register_environments

    register_environments()
    env = gym.make("procgen-maze-v0", distribution_mode="easy", rand_seed=2)
    obs = env.reset()
    assert np.asarray(obs).shape == (64, 64, 3)


def test_interactive_autoplay(tmp_path):
    out = subprocess.run(
        [
            sys.executable, "-m", "procgen_tpu.interactive",
            "--env-name", "maze", "--distribution-mode", "easy",
            "--rand-seed", "7", "--steps", "20",
            "--record-dir", str(tmp_path),
        ],
        # generous: a cold jit in the subprocess on a contended 2-core box
        # has been observed to exceed 600s (r5 full-suite flake)
        capture_output=True, text=True, timeout=1800,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    frames = np.load(tmp_path / "episode.npy")
    assert frames.shape == (20, 64, 64, 3)
