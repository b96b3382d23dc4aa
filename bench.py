#!/usr/bin/env python
"""Throughput benchmark: rendered env-steps/s on the local accelerator.

Each game runs in its OWN subprocess (compiled executables + atlas constants
otherwise accumulate in HBM across games and starve the later ones).  The
parent reports ONE json line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "per_game": {...}}

``value`` is the mean over ALL games, counting failures as 0.
vs_baseline is against the 1,000,000 env-steps/s/chip target (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

TARGET_STEPS_PER_SEC = 1_000_000.0


def bench_game(name: str, num_envs: int, chunk: int, chunks: int, render: bool):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from procgen_tpu.config import EnvConfig, DistributionMode
    from procgen_tpu.games import make_game
    from procgen_tpu.parallel.fast import make_fast_fns
    from procgen_tpu.render.pack import RenderPack
    from procgen_tpu.render.fast2 import render_frames2
    from procgen_tpu import rng as R
    from procgen_tpu.state import init_state_template

    cfg = EnvConfig(
        env_name=name,
        num_envs=num_envs,
        distribution_mode=DistributionMode.hard,
        rand_seed=123,
    )
    gd = make_game(cfg)
    pack = RenderPack(gd, cfg)
    fast_init, fast_step = make_fast_fns(
        gd, cfg, pack, refill_bucket=max(256, num_envs // 8)
    )

    tmpl = init_state_template(gd, cfg)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), tmpl
    )
    master = R.HostMT(123)
    seeds = jnp.asarray(
        [master.randint_full() for _ in range(num_envs)], jnp.int32
    )
    state = batched.replace(level_seed_rng=R.mt_seed(seeds))
    # cold start: first episodes flow through the same bucket-sized refill
    # the step uses, so no full-batch reset program is ever compiled
    fs = jax.jit(fast_init.cold)(state)

    def scan_chunk(carry, _):
        fs, key, checksum = carry
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (num_envs,), 0, 15, jnp.int32)
        fs = fast_step(fs, acts)
        if render:
            obs = render_frames2(gd, cfg, fs.state, pack)
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


# Known-good batch size per game (replaces the old retry ladder, which
# could burn 3 x 1500s per game when a path was broken -- VERDICT r3).
# Static entries are measured HBM fits on the v5e chip (dodgeball needed
# 20.06G of 15.75G at 8192 -- r4; caveflyer 34.2G -- r5);
# tools/bench_warmup.py additionally RECORDS every size it verified into
# bench_logs/num_envs.json, which overrides these so the bench always runs
# the exact shapes whose executables are in the warm compile cache.
GAME_NUM_ENVS: dict[str, int] = {
    "caveflyer": 2048,
    "dodgeball": 4096,
}


def _load_discovered_sizes():
    import os

    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_logs", "num_envs.json")
    try:
        with open(p) as f:
            GAME_NUM_ENVS.update({k: int(v) for k, v in json.load(f).items()})
    except (OSError, ValueError):
        pass


_load_discovered_sizes()


def _first_error_line(stderr: str) -> str:
    """The line that explains a failure -- NOT the last-3-lines JAX banner."""
    lines = (stderr or "").strip().splitlines()
    for pat in ("Mosaic", "RESOURCE_EXHAUSTED", "Error", "error:", "FAILED"):
        for l in lines:
            if pat in l:
                return l.strip()[:300]
    return " | ".join(lines[-2:])[:300]


def run_one_subprocess(game, args, deadline):
    """Run one game's bench in a fresh process; single attempt, budget-aware.

    Returns (steps/s, num_envs).  Full stderr goes to bench_logs/<game>.log;
    the console gets the first line that names the actual error."""
    import os

    n = GAME_NUM_ENVS.get(game, args.num_envs)
    budget = max(60.0, deadline - time.time())
    cmd = [
        sys.executable, __file__, "--one", game,
        "--num-envs", str(n), "--chunk", str(args.chunk),
        "--chunks", str(args.chunks),
    ]
    if args.no_render:
        cmd.append("--no-render")
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=budget)
    except subprocess.TimeoutExpired as e:
        print(f"# {game}: TIMEOUT after {budget:.0f}s at num_envs={n}",
              file=sys.stderr)
        out = None
        stderr = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
    else:
        stderr = out.stderr or ""
    os.makedirs("bench_logs", exist_ok=True)
    with open(f"bench_logs/{game}.log", "w") as f:
        f.write(stderr)
    if out is not None and out.returncode == 0:
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                d = json.loads(line)
                sys.stderr.write(stderr[-2000:])
                return d["steps_per_sec"], n
    if out is not None:
        print(f"# {game}: FAILED at num_envs={n}: {_first_error_line(stderr)}",
              file=sys.stderr)
    return 0.0, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=8192)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--games", type=str, default="")
    ap.add_argument("--no-render", action="store_true")
    ap.add_argument(
        "--budget", type=float, default=2700.0,
        help="total wall-clock budget in seconds for the whole suite "
        "(default leaves >=300s headroom under a 1h driver timeout -- "
        "r2-r4 all scored rc=124 because the final JSON line never "
        "printed before the driver killed the process)",
    )
    ap.add_argument("--one", type=str, default="", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.one:
        sps = bench_game(
            args.one, args.num_envs, args.chunk, args.chunks,
            render=not args.no_render,
        )
        print(json.dumps({"steps_per_sec": sps}))
        return

    from procgen_tpu.games import available_games

    games = args.games.split(",") if args.games else available_games()
    # run the cheap games first: discovered num_envs is a good proxy for
    # program cost (big batches = the fast-compiling, fast-running class),
    # so the slow games inherit the whole leftover budget instead of a
    # 1/16 fair share they cannot fit in
    games = sorted(
        games, key=lambda g: (-GAME_NUM_ENVS.get(g, args.num_envs), g)
    )
    # hard wall-clock ceiling: even a fully-broken path cannot eat more than
    # the driver's budget (VERDICT r3: two rounds scored rc=124)
    deadline = time.time() + args.budget
    per_game = {}

    def emit(partial=False):
        value = sum(per_game.values()) / max(len(per_game), 1)
        print(
            json.dumps(
                {
                    "metric": "env_steps_per_sec_per_chip",
                    "value": round(value, 1),
                    "unit": "steps/s",
                    "vs_baseline": round(value / TARGET_STEPS_PER_SEC, 4),
                    "per_game": per_game,
                    **({"partial": True} if partial else {}),
                }
            ),
            flush=True,
        )

    # last line of defense: if the driver's timeout SIGTERMs us anyway,
    # still emit the JSON line with whatever completed
    import signal

    def on_term(signum, frame):
        for g in games:
            per_game.setdefault(g, 0.0)
        emit(partial=True)
        sys.exit(1)

    signal.signal(signal.SIGTERM, on_term)

    for i, g in enumerate(games):
        remaining = deadline - time.time()
        if remaining <= 0:
            print(f"# {g}: SKIPPED (suite budget exhausted)", file=sys.stderr)
            per_game[g] = 0.0
            continue
        # fair share of what's left, floored so one slow compile doesn't
        # starve a game that would finish
        share = max(remaining / max(len(games) - i, 1), 120.0)
        sps, n = run_one_subprocess(g, args, time.time() + share)
        per_game[g] = round(sps, 1)
    # failures count as 0 in the mean -- a game that can't run is a gap,
    # not a reason to inflate the average
    emit()


if __name__ == "__main__":
    main()
