"""Pre-warm the persistent XLA compile cache for bench.py.

bench.py jits one step-scan executable per game; on a cold cache the
compiles dominate the suite's wall clock (and have blown the driver budget
twice -- VERDICT r2/r3).  This script runs every game once with a single
measurement chunk at the SAME (num_envs, chunk) bench.py uses, so the
cached executables are exactly the ones the real run loads.

Usage:  python tools/bench_warmup.py [--num-envs 8192] [--chunk 64]
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=8192)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--games", type=str, default="")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from procgen_tpu.games import available_games

    games = args.games.split(",") if args.games else available_games()
    for g in games:
        t0 = time.time()
        r = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "bench.py"), "--one", g,
                "--num-envs", str(args.num_envs), "--chunk", str(args.chunk),
                "--chunks", "1",
            ],
            capture_output=True, text=True, timeout=2400, cwd=REPO,
        )
        status = "ok" if r.returncode == 0 else f"rc={r.returncode}"
        print(f"# warm {g}: {time.time() - t0:.0f}s {status}", flush=True)


if __name__ == "__main__":
    main()
