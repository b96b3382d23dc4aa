import time, jax, jax.numpy as jnp
from procgen_tpu.config import EnvConfig, DistributionMode
from procgen_tpu.games import make_game
from procgen_tpu.render.pack import RenderPack
from procgen_tpu.render import renderer as RR
from procgen_tpu.engine.game import reset_env
from procgen_tpu.state import init_state_template
from procgen_tpu import rng as R
N=256
cfg = EnvConfig(env_name="maze", num_envs=N, distribution_mode=DistributionMode.hard, rand_seed=1)
gd = make_game(cfg); pack = RenderPack(gd, cfg)
tmpl = init_state_template(gd, cfg)
b = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (N,)+x.shape), tmpl)
m = R.HostMT(1); seeds = jnp.asarray([m.randint_full() for _ in range(N)], jnp.int32)
b = b.replace(level_seed_rng=R.mt_seed(seeds))
t=time.time()
state = jax.jit(jax.vmap(lambda s: RR.update_view_params(gd,cfg,reset_env(gd,cfg,s))))(b)
jax.block_until_ready(state.grid); print("reset ok", time.time()-t)
t=time.time()
obs = jax.jit(lambda s: RR.render_frames(gd,cfg,s,pack))(state)
jax.block_until_ready(obs); print("render_frames compile+run", time.time()-t, obs.shape)
