#!/usr/bin/env python
"""Throughput benchmark: rendered env-steps/s on the local accelerator.

Runs the fast (level-queue) stepping path with per-step 64x64 RGB rendering
inside a jitted lax.scan, random on-device actions, and reports ONE json
line:  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline is measured against the target of 1,000,000 env-steps/s/chip
(BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from procgen_tpu.config import EnvConfig, DistributionMode
from procgen_tpu.engine.game import reset_env
from procgen_tpu.games import make_game, available_games
from procgen_tpu.parallel.fast import make_fast_fns
from procgen_tpu.render.pack import RenderPack
from procgen_tpu.render.renderer import render_frames, update_view_params
from procgen_tpu import rng as R
from procgen_tpu.state import init_state_template

TARGET_STEPS_PER_SEC = 1_000_000.0


def build_initial(gd, cfg, n, seed):
    tmpl = init_state_template(gd, cfg)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), tmpl
    )
    master = R.HostMT(seed)
    seeds = jnp.asarray([master.randint_full() for _ in range(n)], jnp.int32)
    return batched.replace(level_seed_rng=R.mt_seed(seeds))


def bench_game(name: str, num_envs: int, chunk: int, chunks: int, render: bool):
    cfg = EnvConfig(
        env_name=name,
        num_envs=num_envs,
        distribution_mode=DistributionMode.hard,
        rand_seed=123,
    )
    gd = make_game(cfg)
    pack = RenderPack(gd, cfg)
    fast_init, fast_step = make_fast_fns(gd, cfg, pack, refill_bucket=max(256, num_envs // 8))

    reset_all = jax.jit(
        jax.vmap(lambda s: update_view_params(gd, cfg, reset_env(gd, cfg, s)))
    )
    state = reset_all(build_initial(gd, cfg, num_envs, seed=123))
    fs = jax.jit(fast_init)(state)

    def scan_chunk(carry, _):
        fs, key, checksum = carry
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (num_envs,), 0, 15, jnp.int32)
        fs = fast_step(fs, acts)
        if render:
            obs = render_frames(gd, cfg, fs.state, pack)
            checksum = checksum + jnp.sum(obs[:, 31, 31, :].astype(jnp.uint32))
        return (fs, key, checksum), None

    @jax.jit
    def run_chunk(fs, key, checksum):
        (fs, key, checksum), _ = jax.lax.scan(
            scan_chunk, (fs, key, checksum), None, length=chunk
        )
        return fs, key, checksum

    key = jax.random.PRNGKey(0)
    checksum = jnp.asarray(0, jnp.uint32)
    # warmup & compile
    t0 = time.time()
    fs, key, checksum = run_chunk(fs, key, checksum)
    jax.block_until_ready(checksum)
    compile_time = time.time() - t0

    t0 = time.time()
    for _ in range(chunks):
        fs, key, checksum = run_chunk(fs, key, checksum)
    jax.block_until_ready(checksum)
    dt = time.time() - t0
    steps = num_envs * chunk * chunks
    sps = steps / dt
    print(
        f"# {name}: {sps:,.0f} env-steps/s "
        f"(num_envs={num_envs}, chunk={chunk}, compile={compile_time:.1f}s, "
        f"render={render})",
        file=sys.stderr,
    )
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=8192)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--games", type=str, default="")
    ap.add_argument("--no-render", action="store_true")
    args = ap.parse_args()

    games = args.games.split(",") if args.games else available_games()
    rates = []
    for g in games:
        n = args.num_envs
        while True:
            try:
                sps = bench_game(
                    g, n, args.chunk, args.chunks, render=not args.no_render
                )
                break
            except Exception as e:  # e.g. tunnel compile-size limits
                if n <= 256:
                    print(f"# {g}: FAILED ({e})", file=sys.stderr)
                    sps = 0.0
                    break
                n //= 4
                print(
                    f"# {g}: retrying at num_envs={n} ({type(e).__name__})",
                    file=sys.stderr,
                )
        rates.append(sps)
    value = sum(r for r in rates if r > 0) / max(
        sum(1 for r in rates if r > 0), 1
    )
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "steps/s",
                "vs_baseline": round(value / TARGET_STEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
