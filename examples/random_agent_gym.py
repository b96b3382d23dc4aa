"""
Example random agent script using the classic Gym API to demonstrate that
procgen_tpu works (mirrors reference procgen/examples/random_agent_gym.py).
"""

import random

from procgen_tpu.gym_adapters import make_env

env = make_env(env_name="coinrun")
obs = env.reset()
step = 0
while True:
    obs, rew, done, info = env.step(random.randrange(env.action_space_n))
    print(f"step {step} reward {rew} done {done}")
    step += 1
    if done:
        break
