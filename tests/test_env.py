"""Env-level behavior tests (determinism contract mirrors env_test.py)."""

import numpy as np
import pytest

from procgen_tpu.env import ProcgenTPUEnv


def rollout(env, steps, seed=0):
    rng = np.random.RandomState(seed)
    obs, rews, firsts = [], [], []
    for _ in range(steps):
        env.act(rng.randint(0, 15, size=env.num))
        rew, ob, first = env.observe()
        obs.append(ob["rgb"])
        rews.append(rew.copy())
        firsts.append(first.copy())
    return np.stack(obs), np.stack(rews), np.stack(firsts)


@pytest.mark.parametrize(
    "env_name",
    [
        "maze", "bigfish", "miner", "leaper", "heist", "chaser", "fruitbot",
        "plunder", "bossfight", "dodgeball", "climber", "ninja", "jumper",
        "caveflyer", "coinrun", "starpilot",
    ],
)
def test_determinism(env_name):
    """env_test.py:33-52: identical rollouts at fixed rand_seed."""
    kwargs = dict(num=2, env_name=env_name, rand_seed=23, distribution_mode="easy")
    a = rollout(ProcgenTPUEnv(**kwargs), 32)
    b = rollout(ProcgenTPUEnv(**kwargs), 32)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_seeding_maze():
    """env_test.py:7-30: same start_level => same first obs; different =>
    different."""

    def first_obs(start_level):
        env = ProcgenTPUEnv(
            num=1, env_name="maze", rand_seed=5, num_levels=1,
            start_level=start_level, distribution_mode="easy",
        )
        _, ob, _ = env.observe()
        return ob["rgb"]

    o1 = first_obs(10)
    o2 = first_obs(10)
    o3 = first_obs(11)
    np.testing.assert_array_equal(o1, o2)
    assert not np.array_equal(o1, o3)


def test_maze_agent_never_in_wall():
    env = ProcgenTPUEnv(num=4, env_name="maze", rand_seed=3, distribution_mode="easy")
    rng = np.random.RandomState(1)
    for _ in range(50):
        env.act(rng.randint(0, 15, size=4))
        st = env.state
        gx = np.asarray(st.ents.x[:, 0]).astype(int)
        gy = np.asarray(st.ents.y[:, 0]).astype(int)
        grid = np.asarray(st.grid)
        for i in range(4):
            assert grid[i, gy[i], gx[i]] != 51, (i, gx[i], gy[i])


def test_maze_goal_gives_reward_and_reset():
    """Drive the agent along a solved path: brute-force greedy exploration
    until some env scores; check reward 10, first flag, level re-gen."""
    env = ProcgenTPUEnv(num=8, env_name="maze", rand_seed=11, distribution_mode="easy")
    rng = np.random.RandomState(0)
    got_reward = False
    for _ in range(400):
        env.act(rng.randint(0, 15, size=8))
        rew, ob, first = env.observe()
        if (rew > 0).any():
            got_reward = True
            i = int(np.argmax(rew > 0))
            assert rew[i] == 10.0
            assert first[i]
            info = env.get_info()[i]
            assert info["prev_level_complete"] == 1
            break
    assert got_reward, "no maze solved in 400 random steps across 8 envs"


def test_bigfish_fish_spawn_and_eat():
    env = ProcgenTPUEnv(num=8, env_name="bigfish", rand_seed=9, distribution_mode="easy")
    rng = np.random.RandomState(0)
    total_rew = 0.0
    max_alive = 0
    for _ in range(300):
        env.act(rng.randint(0, 15, size=8))
        rew, _, first = env.observe()
        total_rew += rew.sum()
        max_alive = max(max_alive, int(np.asarray(env.state.ents.alive).sum(axis=1).max()))
    assert max_alive > 2, "fish never spawned"
    # some eating or death should have happened across 2400 env-steps
    assert total_rew > 0 or np.asarray(env.state.cur_time).max() < 300


def test_observation_space():
    env = ProcgenTPUEnv(num=3, env_name="maze", rand_seed=1, distribution_mode="easy")
    rew, ob, first = env.observe()
    assert ob["rgb"].shape == (3, 64, 64, 3)
    assert ob["rgb"].dtype == np.uint8
    assert rew.shape == (3,)
    assert first.all()  # initial observe has first=True (gym3 contract)


def test_miner_digging_and_gravity():
    env = ProcgenTPUEnv(num=4, env_name="miner", rand_seed=5, distribution_mode="easy")
    g0 = np.asarray(env.state.grid)
    space0 = (g0 == 100).sum()
    rng = np.random.RandomState(2)
    for _ in range(40):
        env.act(rng.randint(0, 15, size=4))
    g1 = np.asarray(env.state.grid)
    assert (g1 == 100).sum() > space0, "no digging happened"
    # gravity invariant: no boulder/diamond may hang over SPACE unless the
    # agent stands below or it is mid-fall (moving type handled next sweep)
    st = env.state
    for i in range(4):
        grid = g1[i]
        ax = int(np.asarray(st.ents.x[i, 0]))
        ay = int(np.asarray(st.ents.y[i, 0]))
        H, W = grid.shape
        for y in range(1, H):
            for x in range(W):
                if grid[y, x] in (1, 2):  # settled boulder/diamond
                    below = grid[y - 1, x]
                    if below == 100 and not (ax == x and ay == y - 1):
                        raise AssertionError(f"floating object at {x},{y} env {i}")


def test_fruitbot_drift_and_scoring():
    env = ProcgenTPUEnv(num=8, env_name="fruitbot", rand_seed=4, distribution_mode="easy")
    y0 = np.asarray(env.state.ents.y[:, 0]).copy()
    rng = np.random.RandomState(3)
    saw_reward = False
    saw_done = False
    for t in range(120):
        env.act(rng.randint(0, 15, size=8))
        rew, ob, first = env.observe()
        saw_reward = saw_reward or (rew != 0).any()
        saw_done = saw_done or first.any()
        if t == 5:
            # constant upward drift (action_vy = 0.2)
            y1 = np.asarray(env.state.ents.y[:, 0])
            assert (y1 > y0).all(), "agent did not drift upward"
    assert saw_reward or saw_done, "no fruit/food/wall interaction in 960 steps"


def test_plunder_ships_and_cannon():
    env = ProcgenTPUEnv(num=8, env_name="plunder", rand_seed=8, distribution_mode="easy")
    n_ships = 0
    fired = False
    for t in range(80):
        env.act(np.full(8, 9))  # special action 1: fire
        rew, ob, first = env.observe()
        st = env.state
        types = np.asarray(st.ents.type)
        alive = np.asarray(st.ents.alive)
        n_ships = max(n_ships, int(((types == 7) & alive).sum(axis=1).max()))
        fired = fired or bool(((types == 1) & alive).any())
    assert n_ships > 0, "no ships spawned in 80 steps"
    assert fired, "no cannonball entity observed"
    juice = np.asarray(env.state.extra["juice_left"])
    assert (juice < 1.0).all(), "juice bar never decreased"


def test_bossfight_attacks_and_damage():
    env = ProcgenTPUEnv(num=4, env_name="bossfight", rand_seed=2, distribution_mode="easy")
    h0 = np.asarray(env.state.ents.health[:, 1]).copy()
    saw_enemy_bullet = saw_trail = False
    for t in range(220):
        env.act(np.full(4, 9))  # hold fire
        rew, ob, first = env.observe()
        types = np.asarray(env.state.ents.type)
        alive = np.asarray(env.state.ents.alive)
        saw_enemy_bullet = saw_enemy_bullet or ((types == 4) & alive).any()
        saw_trail = saw_trail or ((types == 5) & alive).any()
    assert saw_enemy_bullet, "boss never fired"
    assert saw_trail, "no laser trails spawned"
    h1 = np.asarray(env.state.ents.health[:, 1])
    first_seen = np.asarray(env.state.cur_time) < 220  # some env reset (died)
    assert (h1 < h0).any() or first_seen.any(), (
        "no boss damage nor any episode end in 880 env-steps"
    )


def test_dodgeball_enemies_move_and_balls_fly():
    env = ProcgenTPUEnv(num=8, env_name="dodgeball", rand_seed=7, distribution_mode="easy")
    st0 = env.state
    e_mask0 = np.asarray(st0.ents.type) == 4
    ex0 = np.asarray(st0.ents.x).copy()
    saw_enemy_ball = False
    saw_done = False
    for t in range(160):
        env.act(np.full(8, 9))  # hold throw
        rew, ob, first = env.observe()
        types = np.asarray(env.state.ents.type)
        alive = np.asarray(env.state.ents.alive)
        saw_enemy_ball = saw_enemy_ball or ((types == 6) & alive).any()
        saw_done = saw_done or first.any()
    # enemies patrol: some enemy position moved in some env that didn't reset
    assert saw_enemy_ball or saw_done, "no enemy ball and no episode end"
    # player balls: the reference's throw gate is
    # "cur_time - last_fire_time >= 7" with last_fire_time starting at 0
    # (dodgeball.cpp:386), so the FIRST throw can only land from cur_time 7
    # on -- hold the throw key past the gate, then expect a live ball
    env2 = ProcgenTPUEnv(num=2, env_name="dodgeball", rand_seed=3, distribution_mode="easy")
    saw_ball = False
    for _ in range(12):
        env2.act(np.full(2, 9))
        env2.observe()
        types2 = np.asarray(env2.state.ents.type)
        alive2 = np.asarray(env2.state.ents.alive)
        saw_ball = saw_ball or ((types2 == 3) & alive2).any()
    assert saw_ball, "throw action spawned no ball within the fire gate"


def test_climber_gravity_and_jump():
    env = ProcgenTPUEnv(num=4, env_name="climber", rand_seed=13, distribution_mode="easy")
    y0 = np.asarray(env.state.ents.y[:, 0]).copy()
    for _ in range(8):
        env.act(np.full(4, 5))  # hold jump/up
        env.observe()
    y1 = np.asarray(env.state.ents.y[:, 0])
    assert (y1 > y0).any(), "agent never rose from the floor with jump held"
    # let gravity settle: noop should not launch the agent upward
    for _ in range(30):
        env.act(np.full(4, 4))
        env.observe()
    vy = np.asarray(env.state.ents.vy[:, 0])
    assert (vy <= 1.5 + 1e-6).all()


def test_ninja_throwing_stars():
    env = ProcgenTPUEnv(num=4, env_name="ninja", rand_seed=21, distribution_mode="easy")
    saw_star = False
    for t in range(30):
        env.act(np.full(4, 9))  # special 1: throw star
        env.observe()
        types = np.asarray(env.state.ents.type)
        alive = np.asarray(env.state.ents.alive)
        saw_star = saw_star or ((types == 7) & alive).any()
    assert saw_star, "no throwing star entity appeared"


def test_starpilot_waves_and_shooting():
    env = ProcgenTPUEnv(num=4, env_name="starpilot", rand_seed=19, distribution_mode="easy")
    saw_enemy = saw_bullet = False
    total_rew = 0.0
    for t in range(120):
        env.act(np.full(4, 9))  # hold fire
        rew, ob, first = env.observe()
        total_rew += float(rew.sum())
        types = np.asarray(env.state.ents.type)
        alive = np.asarray(env.state.ents.alive)
        saw_enemy = saw_enemy or ((types == 4) & alive).any()
        saw_bullet = saw_bullet or ((types == 1) & alive).any()
    assert saw_enemy, "no flyer spawned from the timeline"
    assert saw_bullet, "player bullet never spawned"


def test_caveflyer_ship_physics():
    env = ProcgenTPUEnv(num=4, env_name="caveflyer", rand_seed=23, distribution_mode="easy")
    r0 = np.asarray(env.state.ents.rotation[:, 0]).copy()
    for _ in range(5):
        env.act(np.full(4, 0))  # rotate left+down? action 0: vrot -1
        env.observe()
    r1 = np.asarray(env.state.ents.rotation[:, 0])
    assert not np.allclose(r0, r1), "ship never rotated"


def test_jumper_double_jump_and_trail():
    env = ProcgenTPUEnv(num=4, env_name="jumper", rand_seed=29, distribution_mode="easy")
    saw_trail = False
    for t in range(40):
        env.act(np.full(4, 5 if t % 8 < 4 else 4))
        env.observe()
        types = np.asarray(env.state.ents.type)
        alive = np.asarray(env.state.ents.alive)
        saw_trail = saw_trail or ((types == 59) & alive).any()
    assert saw_trail, "no motion trail spawned"


def test_coinrun_run_right():
    env = ProcgenTPUEnv(num=4, env_name="coinrun", rand_seed=31, distribution_mode="easy")
    x0 = np.asarray(env.state.ents.x[:, 0]).copy()
    for _ in range(40):
        env.act(np.full(4, 7))  # right+up
        env.observe()
    x1 = np.asarray(env.state.ents.x[:, 0])
    assert (x1 > x0 + 1).any(), "agent never ran right"


def test_leaper_hop_and_finish():
    env = ProcgenTPUEnv(num=4, env_name="leaper", rand_seed=6, distribution_mode="easy")
    # hop up repeatedly (action 7 = up in the 3x3 grid: vx 0, vy +1)
    got = 0.0
    for _ in range(60):
        env.act(np.full(4, 5))  # UP (avx 0, avy +1)
        rew, ob, first = env.observe()
        got += rew.sum()
    assert got > 0, "no env reached the finish line hopping straight up"
