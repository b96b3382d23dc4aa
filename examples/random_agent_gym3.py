"""
Example random agent script using the gym3-style API to demonstrate that
procgen_tpu works (mirrors reference procgen/examples/random_agent_gym3.py).
"""

import numpy as np

from procgen_tpu.env import ProcgenTPUEnv

env = ProcgenTPUEnv(num=1, env_name="coinrun")
rng = np.random.default_rng(0)
step = 0
while True:
    env.act(rng.integers(0, 15, size=(env.num,), dtype=np.int32))
    rew, obs, first = env.observe()
    print(f"step {step} reward {rew} first {first}")
    if step > 0 and first:
        break
    step += 1
