"""Pre-warm the persistent XLA compile cache for bench.py.

bench.py jits one step-scan executable per game; on a cold cache the
compiles dominate the suite's wall clock (and have blown the driver budget
twice -- VERDICT r2/r3).  This script runs every game once with a single
measurement chunk at the SAME (num_envs, chunk) bench.py uses, so the
cached executables are exactly the ones the real run loads.

Usage:  python tools/bench_warmup.py [--num-envs 8192] [--chunk 64]
"""

import argparse
import json
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
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)

    games = args.games.split(",") if args.games else available_games()
    os.makedirs(os.path.join(REPO, "bench_logs"), exist_ok=True)
    sizes_path = os.path.join(REPO, "bench_logs", "num_envs.json")
    try:
        with open(sizes_path) as f:
            sizes = {k: int(v) for k, v in json.load(f).items()}
    except (OSError, ValueError):
        sizes = {}

    def run_once(g, n):
        logp = os.path.join(REPO, "bench_logs", f"warm_{g}.log")
        with open(logp, "w") as lf:
            r = subprocess.run(
                [
                    sys.executable, os.path.join(REPO, "bench.py"),
                    "--one", g, "--num-envs", str(n),
                    "--chunk", str(args.chunk), "--chunks", "1",
                ],
                stdout=subprocess.PIPE, stderr=lf, text=True,
                timeout=2400, cwd=REPO,
            )
        log = open(logp).read()
        return r.returncode, log

    for g in games:
        # warm the EXACT (game, num_envs, chunk) tuple bench.py will use:
        # per-game HBM-fitted sizes override the default
        n = sizes.get(g, bench_mod.GAME_NUM_ENVS.get(g, args.num_envs))
        t0 = time.time()
        status, tail = "", []
        try:
            while True:
                rc, log = run_once(g, n)
                if rc == 0:
                    status = "ok"
                    break
                # HBM-driven failure: halve and retry (the discovered size
                # is recorded so bench.py runs the same shape).  "TPU device
                # error" kernel faults have also only been seen at the
                # largest shapes (jumper/leaper/starpilot r5) -- treat as
                # size-driven and back off the same way.
                oom = (
                    "Ran out of memory" in log
                    or "RESOURCE_EXHAUSTED" in log
                    or "TPU device error" in log
                )
                if not oom or n <= 1024:
                    status = f"rc={rc}"
                    break
                n //= 2
                print(f"# warm {g}: OOM, retrying at n={n}", flush=True)
            tail = [
                l for l in log.splitlines()
                if l.strip() and "WARNING" not in l
            ][-1:]
        except subprocess.TimeoutExpired:
            status = "TIMEOUT"
        if status == "ok":
            sizes[g] = n
            with open(sizes_path, "w") as f:
                json.dump(sizes, f, indent=1, sort_keys=True)
        print(
            f"# warm {g}: {time.time() - t0:.0f}s n={n} {status} "
            + (tail[0][:160] if tail else ""),
            flush=True,
        )


if __name__ == "__main__":
    main()
