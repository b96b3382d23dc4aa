"""Run the full 16-game reference-conformance sweep and write a committed
artifact (PARITY_SWEEP.md) recording the verdict per game at the current
HEAD.

VERDICT r2-r4 flagged stale PARITY_GREEN lists three rounds running; this
sweep is the mechanical fix: run it at final HEAD, commit the log, and keep
tests/test_ref_parity.py's lists in sync with it.

Usage:
    python tools/parity_sweep.py [--steps 100] [--jobs 2] [--mode hard]
                                 [--games a,b,...] [--out PARITY_SWEEP.md]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_game(game, steps, mode, num_envs, seed):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "ref_parity.py"),
             game, "--steps", str(steps), "--num-envs", str(num_envs),
             "--mode", mode, "--rand-seed", str(seed)],
            capture_output=True, text=True, timeout=5400, env=env, cwd=REPO,
        )
        ok = out.returncode == 0
        head = (out.stdout or "").strip().splitlines()
        head = head[0] if head else (out.stderr or "")[-200:]
    except subprocess.TimeoutExpired:
        ok, head = False, "TIMEOUT"
    return game, ok, round(time.time() - t0, 1), head


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--num-envs", type=int, default=2)
    ap.add_argument("--rand-seed", type=int, default=23)
    ap.add_argument("--mode", default="hard")
    ap.add_argument("--jobs", type=int, default=2)
    ap.add_argument("--games", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from procgen_tpu.games import available_games

    games = args.games.split(",") if args.games else available_games()
    results = []
    with ThreadPoolExecutor(max_workers=args.jobs) as ex:
        futs = [
            ex.submit(run_game, g, args.steps, args.mode, args.num_envs,
                      args.rand_seed)
            for g in games
        ]
        for f in futs:
            g, ok, dt, head = f.result()
            print(f"{'OK  ' if ok else 'FAIL'} {g:10s} {dt:7.1f}s  {head}",
                  flush=True)
            results.append((g, ok, dt, head))

    n_ok = sum(ok for _, ok, _, _ in results)
    print(f"\n{n_ok}/{len(results)} games bit-identical "
          f"({args.steps} steps x {args.num_envs} envs, {args.mode}, "
          f"seed {args.rand_seed})")
    if args.out:
        git = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=REPO,
        ).stdout.strip()
        with open(os.path.join(REPO, args.out), "w") as f:
            f.write(
                f"# Parity sweep @ {git}\n\n"
                f"`tools/parity_sweep.py --steps {args.steps} --num-envs "
                f"{args.num_envs} --mode {args.mode} --rand-seed "
                f"{args.rand_seed}`\n\n"
                f"**{n_ok}/{len(results)} games bit-identical** (rew, "
                f"first, info, state bytes, every step)\n\n"
                "| game | verdict | wall | detail |\n|---|---|---|---|\n"
            )
            for g, ok, dt, head in sorted(results):
                f.write(f"| {g} | {'OK' if ok else 'FAIL'} | {dt}s "
                        f"| {head[:120]} |\n")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
