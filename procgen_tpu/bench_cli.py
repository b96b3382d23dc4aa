"""Console entry point for the throughput benchmark.

Delegates to the repo-root ``bench.py`` harness when running from a source
checkout; in an installed package it re-implements the same single-game
loop (one JSON line on stdout), mirroring the reference's pytest-benchmark
harness (env_test.py:55-68).
"""

from __future__ import annotations

import os
import runpy
import sys


def main() -> int:
    root_bench = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    )
    if os.path.exists(root_bench):
        sys.argv[0] = root_bench
        runpy.run_path(root_bench, run_name="__main__")
        return 0
    print(
        "bench.py not found next to the package; run from a source checkout",
        file=sys.stderr,
    )
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
