"""Persistent TPU worker: pays the (slow) TPU attach once, then executes
python job files dropped into /tmp/tpu_jobs/ in-process.

Protocol: write <name>.py into /tmp/tpu_jobs/; the server runs it with
exec() in a fresh namespace (prebound: jax, jnp, np, and GLOBALS -- a dict
persisting across jobs) and writes stdout+traceback to <name>.out, then
renames the job to <name>.done.  Poll for the .out file.  A job named
quit.py shuts the server down.
"""

import io
import os
import sys
import time
import traceback
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

t0 = time.time()
import jax
import jax.numpy as jnp
import numpy as np

print(f"ready backend={jax.default_backend()} attach={time.time() - t0:.0f}s", flush=True)

GLOBALS = {}

while True:
    jobs = sorted(f for f in os.listdir(JOBS) if f.endswith(".py"))
    if not jobs:
        time.sleep(0.5)
        continue
    name = jobs[0]
    path = os.path.join(JOBS, name)
    if name == "quit.py":
        os.remove(path)
        break
    src = open(path).read()
    buf = io.StringIO()
    ns = {"jax": jax, "jnp": jnp, "np": np, "GLOBALS": GLOBALS, "time": time}
    t = time.time()
    try:
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
            exec(compile(src, path, "exec"), ns)
        status = "ok"
    except BaseException:
        buf.write(traceback.format_exc())
        status = "error"
    out = buf.getvalue() + f"\n[{status} in {time.time() - t:.1f}s]\n"
    with open(os.path.join(JOBS, name[:-3] + ".out"), "w") as f:
        f.write(out)
    os.rename(path, path + ".done")
    print(f"{name}: {status} ({time.time() - t:.1f}s)", flush=True)
