"""Side-by-side field trace: print chosen serialized fields from the
reference rollout and our env at each step, to localize where a parity
divergence is born (rather than where it first shows in the byte diff).

Usage:
    python tools/trace_fields.py ninja --steps 24 --t0 14 \
        --fields 'ent[3].,ent[4].,ent[5].,game.cur_time,bag.special_action'
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(1, os.path.join(REPO, "tools"))

from ref_parity import MODE_INT, RefRollout, parse_dump, run_refdump, strip_sentinel  # noqa: E402
from state_inspect import annotate  # noqa: E402


def fields_of(blob: bytes, prefixes):
    out = []
    for name, off, size, val in annotate(blob).spans:
        if any(name.startswith(p) for p in prefixes):
            out.append((name, val))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("game")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--t0", type=int, default=0)
    ap.add_argument("--num-envs", type=int, default=2)
    ap.add_argument("--env", type=int, default=0)
    ap.add_argument("--rand-seed", type=int, default=23)
    ap.add_argument("--mode", default="hard")
    ap.add_argument("--fields", default="ent[0].")
    ap.add_argument("--diff-only", action="store_true",
                    help="print only fields whose values differ")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from procgen_tpu.env import ProcgenTPUEnv

    dump_path = (
        f"/tmp/refdump_{args.game}_{args.mode}_{args.rand_seed}_"
        f"{args.num_envs}x{args.steps}.bin"
    )
    if not os.path.exists(dump_path):
        run_refdump(args.game, args.num_envs, args.steps, args.rand_seed,
                    0, 0, args.mode, dump_path)
    ro = parse_dump(dump_path)

    env = ProcgenTPUEnv(
        num=args.num_envs, env_name=args.game, rand_seed=args.rand_seed,
        distribution_mode=args.mode, parity_mode=True, render=False,
    )
    prefixes = [p for p in args.fields.split(",") if p]
    e = args.env

    def show(t, rb, ob):
        if t < args.t0:
            return
        rf = dict(fields_of(rb, prefixes))
        of = dict(fields_of(ob, prefixes))
        print(f"--- t={t}")
        for k in sorted(set(rf) | set(of)):
            rv, ov = rf.get(k), of.get(k)
            mark = "" if rv == ov else "   <<< DIFF"
            if args.diff_only and rv == ov:
                continue
            print(f"  {k:28s} ref={rv!r:24} ours={ov!r:24}{mark}")

    show(-1, strip_sentinel(ro.init_states[e]), env.get_state()[e])
    for t in range(args.steps):
        env.act(np.asarray(ro.actions[t], np.int32))
        show(t, strip_sentinel(ro.states[t][e]), env.get_state()[e])


if __name__ == "__main__":
    main()
