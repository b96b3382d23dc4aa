"""CI gate for reference conformance (the reference's own protocol:
state_test.py:65-124 — replay a golden rollout, diff rewards / firsts /
info ints / state bytes every step).

Runs each game in a SUBPROCESS via tools/ref_parity.py so the parity
configuration (CPU backend, jax_enable_x64, libm callbacks) cannot leak
into — or be broken by — the conftest's virtual-mesh setup.

Games in PARITY_GREEN are verified bit-exact; a regression on any of them
fails the suite.  Games still under investigation (none at present) go in
PARITY_PENDING as strict xfails, so a silent pass forces promotion.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# Verified bit-identical vs the Qt-free reference build (hard, seed 23,
# 100 steps x 2 envs).  The committed sweep artifact for the list below is
# PARITY_SWEEP.md (tools/parity_sweep.py run at the listing commit's HEAD);
# rerun the sweep and refresh both together -- a green list nobody has run
# is worse than no list (VERDICT r2-r4).
PARITY_GREEN = [
    "bigfish",
    "bossfight",
    "caveflyer",
    "chaser",
    "climber",
    "coinrun",
    "dodgeball",
    "fruitbot",
    "heist",
    "jumper",
    "leaper",
    "maze",
    "miner",
    "ninja",
    "plunder",
    "starpilot",
]
# Games with a known divergence under investigation (none at present).
# strict xfail: a pending game that starts passing XPASSes and fails the
# suite, forcing promotion into PARITY_GREEN (ADVICE r4).
PARITY_PENDING: list = []

STEPS = int(os.environ.get("REF_PARITY_CI_STEPS", "100"))


def _run_parity(game: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # the subprocess configures its own backend; drop the conftest's
    # virtual-device XLA flags so its CPU compile cache stays hot
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, str(REPO / "tools" / "ref_parity.py"), game,
         "--steps", str(STEPS), "--num-envs", "2", "--mode", "hard"],
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO,
    )


@pytest.mark.slow
@pytest.mark.parametrize("game", PARITY_GREEN)
def test_ref_parity_bit_exact(game):
    out = _run_parity(game)
    assert out.returncode == 0, (
        f"{game} parity regressed:\n{out.stdout[-3000:]}\n{out.stderr[-500:]}"
    )


@pytest.mark.slow
@pytest.mark.skipif(not PARITY_PENDING, reason="no pending games")
@pytest.mark.parametrize("game", PARITY_PENDING or ["-"])
@pytest.mark.xfail(reason="known parity divergence under investigation",
                   strict=True)
def test_ref_parity_pending(game):
    out = _run_parity(game)
    assert out.returncode == 0, out.stdout[-2000:]
