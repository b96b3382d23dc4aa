"""cppsort vs the real libstdc++ std::sort (compiled oracle).

The tie ORDER matters: starpilot serializes its spawner list post-sort, and
equal spawn_times are common, so a permutation mismatch is a byte-level
parity failure (VERDICT r4 missing #2)."""

import random
import subprocess
from pathlib import Path

import numpy as np
import pytest

from procgen_tpu.utils.cppsort import std_sort_perm

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def oracle():
    src = REPO / "native" / "stdsort_oracle.cpp"
    binary = REPO / "native" / "build" / "stdsort_oracle"
    binary.parent.mkdir(exist_ok=True)
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O2", "-o", str(binary), str(src)], check=True)

    def run(keys, desc):
        inp = f"{len(keys)} {int(desc)} " + " ".join(map(str, keys))
        out = subprocess.run(
            [str(binary)], input=inp, capture_output=True, text=True, check=True
        ).stdout.split()
        return [int(x) for x in out]

    return run


@pytest.mark.parametrize("n", [0, 1, 2, 15, 16, 17, 33, 64, 100, 257, 1000])
@pytest.mark.parametrize("desc", [True, False])
def test_matches_oracle_tie_heavy(oracle, n, desc):
    rng = random.Random(1234 + n + desc)
    # heavy ties: keys drawn from a tiny alphabet, the worst case for
    # unstable-sort emulation
    keys = [rng.randrange(0, max(1, n // 8)) for _ in range(n)]
    comp = (lambda a, b: a > b) if desc else (lambda a, b: a < b)
    got = std_sort_perm(keys, comp)
    want = oracle(keys, desc)
    assert list(got) == want


@pytest.mark.parametrize("seed", range(8))
def test_matches_oracle_random(oracle, seed):
    rng = random.Random(seed)
    n = rng.randrange(1, 400)
    keys = [rng.randrange(-50, 50) for _ in range(n)]
    got = std_sort_perm(keys, lambda a, b: a > b)
    want = oracle(keys, True)
    assert list(got) == want


def test_matches_oracle_adversarial(oracle):
    # sorted / reverse-sorted / all-equal inputs hit the deep-recursion and
    # heapsort-fallback paths
    for keys in (
        list(range(300)),
        list(range(300))[::-1],
        [7] * 300,
        [0, 1] * 150,
        sorted([i % 17 for i in range(500)]),
    ):
        for desc in (True, False):
            comp = (lambda a, b: a > b) if desc else (lambda a, b: a < b)
            assert list(std_sort_perm(keys, comp)) == oracle(keys, desc)


def test_spawner_shape_keys(oracle):
    # spawn_time-like keys: t + j*5 collisions across groups
    rng = random.Random(99)
    t, keys = 1 + rng.randrange(10, 31), []
    while t <= 500:
        g = rng.randrange(1, 6)
        for j in range(g):
            keys.append(t + j * 5)
        t += rng.randrange(10, 31)
    got = std_sort_perm(keys, lambda a, b: a > b)
    assert list(got) == oracle(keys, True)
