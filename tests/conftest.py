"""Test configuration: force a virtual 8-device CPU platform.

Real TPU hardware in CI is a single chip; multi-chip sharding is validated on a
virtual CPU mesh exactly as the driver's dryrun does.  Must run before jax
initializes its backends, hence the env-var dance at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin can override JAX_PLATFORMS; the config knob wins.
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: levelgen graphs are large and identical across
# test runs; caching cuts reruns from minutes to seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def mt_oracle():
    """Compile (once) and return a runner for the std::mt19937 C++ oracle."""
    src = REPO / "native" / "mt19937_oracle.cpp"
    binary = REPO / "native" / "build" / "mt19937_oracle"
    binary.parent.mkdir(exist_ok=True)
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O2", "-o", str(binary), str(src)], check=True
        )

    def run(seed: int, n: int) -> dict:
        out = subprocess.run(
            [str(binary), str(seed), str(n)], check=True, capture_output=True, text=True
        ).stdout
        streams: dict = {"raw": [], "randint": [], "rand01": [], "randfull": []}
        for line in out.splitlines():
            k, v = line.split()
            if k == "rand01":
                streams[k].append(int(v, 16))
            else:
                streams[k].append(int(v))
        return streams

    return run
