"""State save/restore (state_test.py protocol, scaled down)."""

import numpy as np
import pytest

from procgen_tpu.env import ProcgenTPUEnv


@pytest.mark.parametrize("env_name", ["maze", "bigfish", "miner", "leaper"])
def test_state_roundtrip_resumes_identically(env_name):
    """Snapshot mid-rollout, continue; restore into a *different* env (other
    rand_seed) and verify the remainder is identical (state_test.py:79-124)."""
    rng = np.random.RandomState(4)
    env = ProcgenTPUEnv(num=2, env_name=env_name, rand_seed=10, distribution_mode="easy")
    for _ in range(20):
        env.act(rng.randint(0, 15, size=2))
    blobs = env.get_state()
    acts = [rng.randint(0, 15, size=2) for _ in range(25)]

    cont = []
    for a in acts:
        env.act(a)
        rew, ob, first = env.observe()
        cont.append((rew.copy(), ob["rgb"].copy(), first.copy()))

    env2 = ProcgenTPUEnv(num=2, env_name=env_name, rand_seed=99, distribution_mode="easy")
    env2.set_state(blobs)
    for t, a in enumerate(acts):
        env2.act(a)
        rew, ob, first = env2.observe()
        np.testing.assert_array_equal(rew, cont[t][0], err_msg=f"rew step {t}")
        np.testing.assert_array_equal(first, cont[t][2], err_msg=f"first step {t}")
        np.testing.assert_array_equal(ob["rgb"], cont[t][1], err_msg=f"obs step {t}")

    # state bytes also line up after the replay
    np.testing.assert_equal(env.get_state(), env2.get_state())


def test_set_state_idempotent():
    env = ProcgenTPUEnv(num=2, env_name="maze", rand_seed=3, distribution_mode="easy")
    rng = np.random.RandomState(0)
    for _ in range(10):
        env.act(rng.randint(0, 15, size=2))
    b1 = env.get_state()
    env.set_state(b1)
    b2 = env.get_state()
    assert b1 == b2


def test_state_bytes_contain_name_and_version():
    env = ProcgenTPUEnv(num=1, env_name="maze", rand_seed=3, distribution_mode="easy")
    b = env.get_state()[0]
    assert b[:4] == b"\x00\x00\x00\x00"  # SERIALIZE_VERSION 0
    assert b"maze" in b[:16]
