"""Stage-by-stage timing probe for the fast path on the attached TPU.

Prints wall time for: TPU init, pack build, reset compile+run, fast_init,
step-chunk compile, steady-state steps/s. Unbuffered prints so progress is
visible while compiles run.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t_start = time.time()


def log(msg):
    print(f"[{time.time() - t_start:7.1f}s] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("game", nargs="?", default="maze")
    ap.add_argument("--num-envs", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--no-render", action="store_true")
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    if args.no_cache:
        os.environ["PROCGEN_TPU_COMPILE_CACHE"] = "0"

    import jax
    import jax.numpy as jnp

    log(f"jax imported, backend={jax.default_backend()}")

    from procgen_tpu.config import EnvConfig, DistributionMode
    from procgen_tpu.engine.game import reset_env
    from procgen_tpu.games import make_game
    from procgen_tpu.parallel.fast import make_fast_fns
    from procgen_tpu.render.pack import RenderPack
    from procgen_tpu.render.fast2 import render_frames2
    from procgen_tpu.render.renderer import update_view_params
    from procgen_tpu import rng as R
    from procgen_tpu.state import init_state_template

    cfg = EnvConfig(
        env_name=args.game, num_envs=args.num_envs,
        distribution_mode=DistributionMode.hard, rand_seed=123,
    )
    gd = make_game(cfg)
    pack = RenderPack(gd, cfg)
    log("pack built")

    fast_init, fast_step = make_fast_fns(
        gd, cfg, pack, refill_bucket=max(256, args.num_envs // 8)
    )
    tmpl = init_state_template(gd, cfg)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (args.num_envs,) + x.shape), tmpl
    )
    master = R.HostMT(123)
    seeds = jnp.asarray(
        [master.randint_full() for _ in range(args.num_envs)], jnp.int32
    )
    state = batched.replace(level_seed_rng=R.mt_seed(seeds))
    log("state template built")

    state = jax.jit(
        jax.vmap(lambda s: update_view_params(gd, cfg, reset_env(gd, cfg, s)))
    )(state)
    jax.block_until_ready(state.done)
    log("reset compiled+ran")

    fs = jax.jit(fast_init)(state)
    jax.block_until_ready(fs.state.done)
    log("fast_init compiled+ran")

    render = not args.no_render

    def scan_chunk(carry, _):
        fs, key, checksum = carry
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (args.num_envs,), 0, 15, jnp.int32)
        fs = fast_step(fs, acts)
        if render:
            obs = render_frames2(gd, cfg, fs.state, pack)
            checksum = checksum + jnp.sum(obs[:, 31, 31, :].astype(jnp.uint32))
        return (fs, key, checksum), None

    @jax.jit
    def run_chunk(fs, key, checksum):
        (fs, key, checksum), _ = jax.lax.scan(
            scan_chunk, (fs, key, checksum), None, length=args.chunk
        )
        return fs, key, checksum

    key = jax.random.PRNGKey(0)
    checksum = jnp.asarray(0, jnp.uint32)
    lowered = run_chunk.lower(fs, key, checksum)
    log("chunk traced/lowered")
    compiled = lowered.compile()
    log("chunk compiled")
    fs, key, checksum = compiled(fs, key, checksum)
    jax.block_until_ready(checksum)
    log("chunk first run done")

    t0 = time.time()
    for _ in range(args.chunks):
        fs, key, checksum = compiled(fs, key, checksum)
    jax.block_until_ready(checksum)
    dt = time.time() - t0
    steps = args.num_envs * args.chunk * args.chunks
    log(f"steady: {steps / dt:,.0f} env-steps/s (render={render}, "
        f"num_envs={args.num_envs})")


if __name__ == "__main__":
    main()
