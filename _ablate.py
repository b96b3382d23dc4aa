import time, jax, jax.numpy as jnp
from procgen_tpu.config import EnvConfig, DistributionMode
from procgen_tpu.games import make_game
from procgen_tpu.render.pack import RenderPack
from procgen_tpu.render import renderer as RR
from procgen_tpu.engine.game import reset_env, step_env_no_reset, finish_step
from procgen_tpu.parallel.fast import make_fast_fns, FastState
from procgen_tpu.state import init_state_template, tree_select
from procgen_tpu import rng as R

N=8192
cfg = EnvConfig(env_name="maze", num_envs=N, distribution_mode=DistributionMode.hard, rand_seed=1)
gd = make_game(cfg); pack = RenderPack(gd, cfg)
tmpl = init_state_template(gd, cfg)
b = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (N,)+x.shape), tmpl)
m = R.HostMT(1); seeds = jnp.asarray([m.randint_full() for _ in range(N)], jnp.int32)
b = b.replace(level_seed_rng=R.mt_seed(seeds))
state = jax.jit(jax.vmap(lambda s: RR.update_view_params(gd,cfg,reset_env(gd,cfg,s))))(b)
fast_init, fast_step = make_fast_fns(gd, cfg, pack, refill_bucket=1024)
fs = jax.jit(fast_init)(state)
jax.block_until_ready(fs.state.grid)

def scan_bench(name, body, carry, chunk=32, reps=3):
    @jax.jit
    def run(c):
        return jax.lax.scan(body, c, None, length=chunk)[0]
    c = run(carry); jax.block_until_ready(jax.tree_util.tree_leaves(c)[0])
    t=time.time()
    for _ in range(reps): c = run(c)
    jax.block_until_ready(jax.tree_util.tree_leaves(c)[0])
    dt = (time.time()-t)/reps/chunk*1000
    print(name, f"{dt:.2f} ms/step")

step_nr = jax.vmap(lambda s,a: step_env_no_reset(gd,cfg,s,a))
view = jax.vmap(lambda s: RR.update_view_params(gd,cfg,s))
acts0 = jnp.zeros((N,), jnp.int32)

def body_steponly(s, _):
    return step_nr(s, acts0), None
scan_bench("step_no_reset only", body_steponly, fs.state)

def body_step_view(s, _):
    return view(step_nr(s, acts0)), None
scan_bench("step + view", body_step_view, fs.state)

def body_full(f, _):
    return fast_step(f, acts0), None
scan_bench("full fast_step", body_full, fs)

def body_merge(f, _):
    stepped = step_nr(f.state, acts0)
    merged_queue = f.queue.replace(**{k: getattr(stepped,k) for k in ("reward","done","level_complete","prev_level_seed","last_reward","last_reward_timer")})
    st = tree_select(stepped.done, merged_queue, stepped)
    st = finish_step(cfg, st)
    st = view(st)
    return FastState(st, f.queue, f.queue_valid & ~stepped.done), None
scan_bench("step+merge+view (no refill cond)", body_merge, fs)
