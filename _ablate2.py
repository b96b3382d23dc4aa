import time, jax, jax.numpy as jnp
from procgen_tpu.config import EnvConfig, DistributionMode
from procgen_tpu.games import make_game
from procgen_tpu.render.pack import RenderPack
from procgen_tpu.render import renderer as RR
from procgen_tpu.engine.game import reset_env
from procgen_tpu.parallel.fast import make_fast_fns
from procgen_tpu.state import init_state_template
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
    print(name, f"{(time.time()-t)/reps/chunk*1000:.2f} ms/step")

acts0 = jnp.zeros((N,), jnp.int32)

def body_render_only(carry, _):
    s, ck = carry
    obs = RR.render_frames(gd, cfg, s, pack)
    return (s, ck + jnp.sum(obs[:,31,31,:].astype(jnp.uint32))), None
#scan_bench("render_frames only", body_render_only, (fs.state, jnp.uint32(0)))

def body_step_render(carry, _):
    f, ck = carry
    f = fast_step(f, acts0)
    obs = RR.render_frames(gd, cfg, f.state, pack)
    return (f, ck + jnp.sum(obs[:,31,31,:].astype(jnp.uint32))), None
#scan_bench("fast_step + render", body_step_render, (fs, jnp.uint32(0)))

def body_step_only(carry, _):
    f, ck = carry
    f = fast_step(f, acts0)
    return (f, ck), None
#scan_bench("fast_step only", body_step_only, (fs, jnp.uint32(0)))

from procgen_tpu.engine.game import step_env_no_reset, finish_step
from procgen_tpu.state import tree_select
from procgen_tpu.parallel.fast import FastState
step_nr = jax.vmap(lambda s,a: step_env_no_reset(gd,cfg,s,a))
view = jax.vmap(lambda s: RR.update_view_params(gd,cfg,s))

def body_norefill_render(carry, _):
    f, ck = carry
    stepped = step_nr(f.state, acts0)
    merged_queue = f.queue.replace(**{k: getattr(stepped,k) for k in ("reward","done","level_complete","prev_level_seed","last_reward","last_reward_timer")})
    st = tree_select(stepped.done, merged_queue, stepped)
    st = view(finish_step(cfg, st))
    f = FastState(st, f.queue, f.queue_valid & ~stepped.done)
    obs = RR.render_frames(gd, cfg, f.state, pack)
    return (f, ck + jnp.sum(obs.astype(jnp.uint32))), None
scan_bench("step+merge+render (no refill cond)", body_norefill_render, (fs, jnp.uint32(0)))

def body_step_render_fullsum(carry, _):
    f, ck = carry
    f = fast_step(f, acts0)
    obs = RR.render_frames(gd, cfg, f.state, pack)
    return (f, ck + jnp.sum(obs.astype(jnp.uint32))), None
scan_bench("fast_step + render (fullsum)", body_step_render_fullsum, (fs, jnp.uint32(0)))

def body_steponly_tocheck(carry, _):
    f, ck = carry
    f = fast_step(f, acts0)
    return (f, ck + jnp.sum(f.state.static_layer.astype(jnp.uint32))), None
scan_bench("fast_step + read static_layer", body_steponly_tocheck, (fs, jnp.uint32(0)))
