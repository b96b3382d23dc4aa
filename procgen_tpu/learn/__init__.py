"""PPO learner over the TPU env engine (train-procgen parity slice).

The reference repo ships no learner; its companion openai/train-procgen
trains PPO (baselines ppo2, IMPALA CNN) on these envs via MPI data
parallelism.  Here the whole loop -- env step, render, rollout storage, GAE,
PPO update -- is one jitted program: envs and minibatches shard over the
device mesh's ``env`` axis and XLA inserts the gradient ``psum``s.
"""

from procgen_tpu.learn.nets import ImpalaCNN  # noqa: F401
from procgen_tpu.learn.ppo import PPOConfig, make_train_fns  # noqa: F401
