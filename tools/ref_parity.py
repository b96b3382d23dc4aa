"""Reference-conformance harness: replay golden rollouts from the Qt-free
reference build (native/refharness/refdump) through procgen_tpu and diff
rewards, first flags, info ints, and state bytes step by step.

This is the reference's own state_test.py:65-124 protocol, with the
reference side produced by compiling /root/reference/procgen/src against
stub Qt headers (native/refharness/) -- the first time this repo's "bit
exact" claims are checked against the actual reference implementation.

Usage:
    python tools/ref_parity.py maze --steps 200 --num-envs 2 --mode hard
"""

from __future__ import annotations

import argparse
import os
import struct
import subprocess
import sys
from dataclasses import dataclass, field

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(1, os.path.join(REPO, "tools"))
REFDUMP = os.path.join(REPO, "native", "refharness", "refdump")

MODE_INT = {"easy": 0, "hard": 1, "extreme": 2, "memory": 10}


@dataclass
class RefRollout:
    num_envs: int
    steps: int
    init_states: list
    init_rew: list
    init_first: list
    actions: list = field(default_factory=list)  # (T, N)
    rew: list = field(default_factory=list)
    first: list = field(default_factory=list)
    prev_level_seed: list = field(default_factory=list)
    prev_level_complete: list = field(default_factory=list)
    level_seed: list = field(default_factory=list)
    states: list = field(default_factory=list)  # (T, N) bytes


def build_refdump():
    src = os.path.join(REPO, "native", "refharness")
    dep_mtime = max(
        os.path.getmtime(os.path.join(dirpath, f))
        for dirpath, _, files in os.walk(src)
        for f in files
        if f.endswith((".cpp", ".h"))
    )
    if not os.path.exists(REFDUMP) or os.path.getmtime(REFDUMP) < dep_mtime:
        cmd = (
            f"g++ -O2 -std=c++17 -w -I{src} -I{src}/qtstub "
            f"-I/root/reference/procgen/src {src}/dump.cpp "
            f"/root/reference/procgen/src/*.cpp "
            f"/root/reference/procgen/src/games/*.cpp -o {REFDUMP}"
        )
        subprocess.run(cmd, shell=True, check=True)
    return REFDUMP


def run_refdump(game, num_envs, steps, rand_seed, num_levels, start_level, mode, out):
    build_refdump()
    subprocess.run(
        [
            REFDUMP, game, str(num_envs), str(steps), str(rand_seed),
            str(num_levels), str(start_level), str(MODE_INT[mode]), out,
        ],
        check=True, capture_output=True,
    )


def parse_dump(path) -> RefRollout:
    with open(path, "rb") as f:
        data = f.read()
    off = 0

    def r32():
        nonlocal off
        (v,) = struct.unpack_from("<i", data, off)
        off += 4
        return v

    def rf32(n):
        nonlocal off
        v = struct.unpack_from(f"<{n}f", data, off)
        off += 4 * n
        return list(v)

    def ru8(n):
        nonlocal off
        v = list(data[off : off + n])
        off += n
        return v

    def ri32(n):
        nonlocal off
        v = struct.unpack_from(f"<{n}i", data, off)
        off += 4 * n
        return list(v)

    def rstates(n):
        out = []
        for _ in range(n):
            ln = r32()
            nonlocal off
            out.append(data[off : off + ln])
            off += ln
        return out

    n = r32()
    T = r32()
    ro = RefRollout(n, T, [], [], [])
    ro.init_states = rstates(n)
    ro.init_rew = rf32(n)
    ro.init_first = ru8(n)
    for _ in range(T):
        ro.actions.append(ri32(n))
        ro.rew.append(rf32(n))
        ro.first.append(ru8(n))
        ro.prev_level_seed.append(ri32(n))
        ro.prev_level_complete.append(ru8(n))
        ro.level_seed.append(ri32(n))
        ro.states.append(rstates(n))
    assert off == len(data), (off, len(data))
    return ro


def strip_sentinel(blob: bytes) -> bytes:
    """get_state appends END_OF_BUFFER=0xCAFECAFE (vecgame.cpp:443)."""
    assert blob[-4:] == b"\xfe\xca\xfe\xca", blob[-4:]
    return blob[:-4]


def first_diff(a: bytes, b: bytes):
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return None if len(a) == len(b) else n


def compare_game(game, steps=100, num_envs=2, rand_seed=23, mode="hard",
                 num_levels=0, start_level=0, verbose=True, max_report=12):
    import numpy as np

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    # The axon TPU plugin overrides JAX_PLATFORMS; the config knob wins.
    # Parity mode needs the CPU backend: f64 double-rounding emulation plus
    # pure_callback into the host libm (axon_pjrt has no host callbacks).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # parity_mode f64 sites
    # persistent compile cache: repeated parity runs skip the big compiles
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from procgen_tpu.env import ProcgenTPUEnv

    dump_path = f"/tmp/refdump_{game}_{mode}_{rand_seed}_{num_envs}x{steps}.bin"
    if not os.path.exists(dump_path):
        run_refdump(game, num_envs, steps, rand_seed, num_levels, start_level,
                    mode, dump_path)
    ro = parse_dump(dump_path)

    env = ProcgenTPUEnv(
        num=num_envs, env_name=game, rand_seed=rand_seed,
        distribution_mode=mode, num_levels=num_levels,
        start_level=start_level, parity_mode=True, render=False,
    )

    problems = []

    def describe(rb, ob, d):
        """Name the differing field via the annotated layout parser."""
        try:
            from state_inspect import annotate, find

            hit_r = find(annotate(rb), d)
            hit_o = find(annotate(ob), d)
            return f" [ref field {hit_r}, ours {hit_o}]"
        except Exception as exc:  # annotation is best-effort
            return f" [inspect failed: {exc}]"

    def check_states(t, ours):
        refs = ro.init_states if t < 0 else ro.states[t]
        for e in range(num_envs):
            rb = strip_sentinel(refs[e])
            ob = ours[e]
            if rb != ob:
                d = first_diff(rb, ob)
                problems.append(
                    f"t={t} env={e}: state bytes differ at offset {d} "
                    f"(ref len {len(rb)}, ours {len(ob)}); "
                    f"ref[{d}:{d+16 if d else 0}]={rb[d:d+16].hex() if d is not None else ''} "
                    f"ours={ob[d:d+16].hex() if d is not None else ''}"
                    + describe(rb, ob, d)
                )
                if os.environ.get("REF_PARITY_DUMP"):
                    dd = os.environ["REF_PARITY_DUMP"]
                    os.makedirs(dd, exist_ok=True)
                    with open(f"{dd}/{game}_t{t}_e{e}_ref.bin", "wb") as f:
                        f.write(rb)
                    with open(f"{dd}/{game}_t{t}_e{e}_ours.bin", "wb") as f:
                        f.write(ob)
                return False
        return True

    ok = check_states(-1, env.get_state())
    rew, obs, first = env.observe()
    # initial rew/first (previously parsed but unchecked -- VERDICT r2 weak #5)
    if not np.allclose(np.asarray(rew), np.asarray(ro.init_rew)):
        problems.append(f"t=-1: init rew ours={list(map(float, rew))} ref={ro.init_rew}")
    if list(np.asarray(first).astype(int)) != ro.init_first:
        problems.append(
            f"t=-1: init first ours={list(np.asarray(first).astype(int))} ref={ro.init_first}"
        )
    for t in range(steps):
        if problems and len(problems) >= max_report:
            break
        env.act(np.asarray(ro.actions[t], np.int32))
        rew, obs, first = env.observe()
        info = env.get_info()
        if not np.allclose(np.asarray(rew), np.asarray(ro.rew[t])):
            problems.append(f"t={t}: rew ours={list(map(float, rew))} ref={ro.rew[t]}")
        if list(np.asarray(first).astype(int)) != ro.first[t]:
            problems.append(f"t={t}: first ours={list(np.asarray(first).astype(int))} ref={ro.first[t]}")
        for key, refv in (
            ("prev_level_seed", ro.prev_level_seed[t]),
            ("prev_level_complete", ro.prev_level_complete[t]),
            ("level_seed", ro.level_seed[t]),
        ):
            ours = [int(i[key]) for i in info]
            if ours != refv:
                problems.append(f"t={t}: {key} ours={ours} ref={refv}")
        if not check_states(t, env.get_state()):
            pass
    if verbose:
        if problems:
            print(f"[{game}/{mode}] FAIL ({len(problems)} problems):")
            for p in problems[:max_report]:
                print("  " + p)
        else:
            print(f"[{game}/{mode}] OK: {steps} steps x {num_envs} envs "
                  f"bit-identical (rew, first, info, state bytes)")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("games", nargs="+")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--num-envs", type=int, default=2)
    ap.add_argument("--rand-seed", type=int, default=23)
    ap.add_argument("--mode", default="hard")
    args = ap.parse_args()
    bad = 0
    for g in args.games:
        problems = compare_game(
            g, steps=args.steps, num_envs=args.num_envs,
            rand_seed=args.rand_seed, mode=args.mode,
        )
        bad += bool(problems)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
