"""PPO over the fast env path: scan-based rollouts, GAE, clipped updates.

Hyperparameters default to the Procgen paper / train-procgen settings
(ppo2: nsteps 256, nminibatches 8, 3 epochs, gamma .999, lam .95, clip .2,
lr 5e-4, ent .01, vf .5).  The entire (rollout + update) iteration is one
jitted function of (train_state, env_state, rng); sharding the env axis over
a device mesh data-parallelizes it, with XLA inserting gradient reductions.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from procgen_tpu.learn.nets import ImpalaCNN


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    n_steps: int = 256
    n_minibatches: int = 8
    n_epochs: int = 3
    gamma: float = 0.999
    lam: float = 0.95
    clip_eps: float = 0.2
    lr: float = 5e-4
    ent_coef: float = 0.01
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


class Transition(NamedTuple):
    obs: jax.Array  # (T, N, 64, 64, 3) uint8
    action: jax.Array  # (T, N) int32
    logp: jax.Array  # (T, N)
    value: jax.Array  # (T, N)
    reward: jax.Array  # (T, N)
    done: jax.Array  # (T, N) bool: episode boundary BEFORE this obs


def make_train_fns(gd, cfg, pack, ppo: PPOConfig, fast_step, render_fn):
    """Returns (init_params_fn, train_iter_fn, act_fn).

    ``fast_step(fs, actions) -> fs`` and ``render_fn(state) -> obs`` come
    from parallel.fast / render.fast2; the learner treats them as black-box
    pure functions, so the same code drives any game (or joint batch).
    """
    net = ImpalaCNN()
    tx = optax.chain(
        optax.clip_by_global_norm(ppo.max_grad_norm),
        optax.adam(ppo.lr, eps=1e-5),
    )

    def init_train_state(rng) -> TrainState:
        dummy = jnp.zeros((1, 64, 64, 3), jnp.uint8)
        params = net.init(rng, dummy)
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    def policy(params, obs, rng):
        logits, value = net.apply(params, obs)
        action = jax.random.categorical(rng, logits)
        logp = jax.nn.log_softmax(logits)[jnp.arange(logits.shape[0]), action]
        return action.astype(jnp.int32), logp, value

    def rollout(ts: TrainState, fs, rng):
        def step(carry, _):
            fs, rng = carry
            rng, sub = jax.random.split(rng)
            obs = render_fn(fs.state)
            done = fs.state.done
            action, logp, value = policy(ts.params, obs, sub)
            fs2 = fast_step(fs, action)
            t = Transition(obs, action, logp, value,
                           fs2.state.reward, done)
            return (fs2, rng), t

        (fs, rng), traj = jax.lax.scan(
            step, (fs, rng), None, length=ppo.n_steps
        )
        # bootstrap value for the state after the last step
        _, last_value = net.apply(ts.params, render_fn(fs.state))
        return fs, rng, traj, last_value

    def gae(traj: Transition, last_value, last_done):
        def scan_fn(carry, t):
            gae_t = carry
            value_tp1, done_tp1, reward_t, value_t = t
            nonterm = 1.0 - done_tp1.astype(jnp.float32)
            delta = reward_t + ppo.gamma * value_tp1 * nonterm - value_t
            gae_t = delta + ppo.gamma * ppo.lam * nonterm * gae_t
            return gae_t, gae_t

        value_tp1 = jnp.concatenate(
            [traj.value[1:], last_value[None]], axis=0
        )
        done_tp1 = jnp.concatenate([traj.done[1:], last_done[None]], axis=0)
        _, adv = jax.lax.scan(
            scan_fn,
            jnp.zeros_like(last_value),
            (value_tp1, done_tp1, traj.reward, traj.value),
            reverse=True,
        )
        return adv, adv + traj.value

    def loss_fn(params, mb):
        obs, action, old_logp, old_value, adv, ret = mb
        logits, value = net.apply(params, obs)
        logp_all = jax.nn.log_softmax(logits)
        logp = logp_all[jnp.arange(action.shape[0]), action]
        ratio = jnp.exp(logp - old_logp)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = -adv_n * ratio
        pg2 = -adv_n * jnp.clip(ratio, 1 - ppo.clip_eps, 1 + ppo.clip_eps)
        pg_loss = jnp.maximum(pg1, pg2).mean()
        # clipped value loss (ppo2)
        v_clip = old_value + jnp.clip(
            value - old_value, -ppo.clip_eps, ppo.clip_eps
        )
        v_loss = 0.5 * jnp.maximum(
            (value - ret) ** 2, (v_clip - ret) ** 2
        ).mean()
        entropy = -(jnp.exp(logp_all) * logp_all).sum(-1).mean()
        total = pg_loss + ppo.vf_coef * v_loss - ppo.ent_coef * entropy
        return total, (pg_loss, v_loss, entropy)

    def update(ts: TrainState, batch, rng):
        T, N = batch[1].shape
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((T * N,) + x.shape[2:]), batch
        )
        mb_size = (T * N) // ppo.n_minibatches

        def epoch(carry, _):
            ts, rng = carry
            rng, sub = jax.random.split(rng)
            perm = jax.random.permutation(sub, T * N)
            shuf = jax.tree_util.tree_map(lambda x: x[perm], flat)

            def minibatch(ts, mb_idx):
                mb = jax.tree_util.tree_map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, mb_idx * mb_size, mb_size
                    ),
                    shuf,
                )
                (l, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    ts.params, mb
                )
                updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
                params = optax.apply_updates(ts.params, updates)
                return TrainState(params, opt_state, ts.step + 1), (l, *aux)

            ts, metrics = jax.lax.scan(
                minibatch, ts, jnp.arange(ppo.n_minibatches)
            )
            return (ts, rng), metrics

        (ts, rng), metrics = jax.lax.scan(
            epoch, (ts, rng), None, length=ppo.n_epochs
        )
        return ts, jax.tree_util.tree_map(lambda m: m.mean(), metrics)

    def episode_stats(ep_acc, traj):
        """Fold the rollout into completed-episode returns.

        ``traj.done[t]`` marks an episode boundary BEFORE obs ``t``, so at a
        marked step the accumulator holds the finished episode's return."""

        def step(acc, rd):
            r, d = rd
            comp_sum = jnp.sum(jnp.where(d, acc, 0.0))
            comp_cnt = jnp.sum(d)
            acc = jnp.where(d, 0.0, acc) + r
            return acc, (comp_sum, comp_cnt)

        ep_acc, (sums, cnts) = jax.lax.scan(
            step, ep_acc, (traj.reward, traj.done)
        )
        n = cnts.sum()
        # NaN (not 0.0) when nothing finished, so dashboards can tell
        # "no episodes completed this rollout" from "episodes returned 0"
        mean = jnp.where(
            n > 0, sums.sum() / jnp.maximum(n, 1).astype(sums.dtype), jnp.nan
        )
        return ep_acc, mean, n

    def train_iter(ts: TrainState, fs, rng, ep_acc):
        """One PPO iteration: n_steps rollout + minibatched updates.

        ``ep_acc`` is the (num_envs,) running per-env episode-return
        accumulator, carried across iterations so episodes spanning a
        rollout boundary are scored once, in full.
        Returns (ts, fs, ep_acc, metrics dict)."""
        fs, rng, traj, last_value = rollout(ts, fs, rng)
        adv, ret = gae(traj, last_value, fs.state.done)
        batch = (traj.obs, traj.action, traj.logp, traj.value, adv, ret)
        rng, sub = jax.random.split(rng)
        ts, (l, pg, vf, ent) = update(ts, batch, sub)
        ep_acc, mean_ep_ret, n_eps = episode_stats(ep_acc, traj)
        metrics = {
            "loss": l, "pg_loss": pg, "v_loss": vf, "entropy": ent,
            "reward_per_step": traj.reward.mean(),
            "episode_ends": traj.done.sum(),
            "mean_ep_return": mean_ep_ret,
            "episodes": n_eps,
        }
        return ts, fs, ep_acc, metrics

    return init_train_state, train_iter, policy
