"""User-facing environment API.

``ProcgenTPUEnv`` mirrors the gym3-style surface of the reference's
``ProcgenGym3Env`` (env.py:203-246 + gym3.libenv.CEnv semantics): ``observe()``
-> (rew, {"rgb": obs}, first), ``act(actions)``, ``get_info()``.  Underneath
it is a thin stateful shell over the pure functional API (``reset_fn`` /
``step_fn``), which is what TPU-scale training loops should use directly
(e.g. inside their own ``lax.scan`` rollouts).

Construction-time seeding follows vecgame.cpp:301-314: a master MT19937
seeded with ``rand_seed`` deals one full-width randint per env to seed that
env's level_seed_rand_gen.
"""

from __future__ import annotations

import random as _pyrandom
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import rng as R
from procgen_tpu.config import EnvConfig, DistributionMode
from procgen_tpu.engine.game import reset_env, step_env
from procgen_tpu.games import make_game
from procgen_tpu.render.pack import RenderPack
from procgen_tpu.render.fast2 import render_frames2, render_static2
from procgen_tpu.render.renderer import render_env, update_view_params
from procgen_tpu.state import EnvState, init_state_template

DISTRIBUTION_MODE_NAMES = {
    "easy": DistributionMode.easy,
    "hard": DistributionMode.hard,
    "extreme": DistributionMode.extreme,
    "memory": DistributionMode.memory,
    "exploration": DistributionMode.exploration,
}


def create_random_seed() -> int:
    """env.py:54-63 (sans MPI rank offsetting, which multi-host JAX replaces
    with jax.process_index-unique seeding in parallel/sharding.py)."""
    return _pyrandom.SystemRandom().randint(0, 2**31 - 1)


class ProcgenTPUEnv:
    """Batched TPU-native procgen env (one game per instance)."""

    def __init__(
        self,
        num: int,
        env_name: str = "coinrun",
        *,
        rand_seed: Optional[int] = None,
        num_levels: int = 0,
        start_level: int = 0,
        distribution_mode: str | DistributionMode = "hard",
        paint_vel_info: bool = False,
        use_generated_assets: bool = False,
        use_monochrome_assets: bool = False,
        restrict_themes: bool = False,
        use_backgrounds: bool = True,
        center_agent: bool = True,  # reference env.py:211
        use_sequential_levels: bool = False,
        num_threads: int = 4,  # accepted for API parity; no thread pool here
        render: bool = True,
        render_mode: Optional[str] = None,
        parity_mode: bool = False,
        _level_rng_seeds: Optional[list[int]] = None,
    ):
        if isinstance(distribution_mode, str):
            distribution_mode = DISTRIBUTION_MODE_NAMES[distribution_mode]
        if rand_seed is None:
            rand_seed = create_random_seed()
        cfg = EnvConfig(
            env_name=env_name,
            num_envs=num,
            num_levels=num_levels,
            start_level=start_level,
            rand_seed=rand_seed,
            distribution_mode=distribution_mode,
            paint_vel_info=paint_vel_info,
            use_generated_assets=use_generated_assets,
            use_monochrome_assets=use_monochrome_assets,
            restrict_themes=restrict_themes,
            use_backgrounds=use_backgrounds,
            center_agent=center_agent,
            use_sequential_levels=use_sequential_levels,
            parity_mode=parity_mode,
        ).resolve_exploration()
        self.cfg = cfg
        self.num = num
        self.gd = make_game(cfg)
        self.pack = RenderPack(self.gd, cfg)
        self._do_render = render

        gd, pack = self.gd, self.pack

        def _refresh_static_batched(states, force=False):
            # recompute the per-level static layer only when some env needs
            # it (the naive jnp.where(done, fresh, ...) would pay full
            # levelgen-render cost every step for every env)
            def fresh(ss):
                new = render_static2(gd, cfg, ss, pack)
                if force:
                    return ss.replace(static_layer=new)
                return ss.replace(
                    static_layer=jnp.where(
                        ss.done[:, None, None, None], new, ss.static_layer
                    )
                )

            if force:
                return fresh(states)
            return jax.lax.cond(
                jnp.any(states.done), fresh, lambda ss: ss, states
            )

        def _reset_all(states):
            states = jax.vmap(
                lambda s: update_view_params(gd, cfg, reset_env(gd, cfg, s))
            )(states)
            return _refresh_static_batched(states, force=True)

        def _step_all(states, actions):
            states = jax.vmap(
                lambda s, a: update_view_params(gd, cfg, step_env(gd, cfg, s, a))
            )(states, actions)
            return _refresh_static_batched(states)

        self._reset_all = jax.jit(_reset_all)
        self._step_all = jax.jit(_step_all)
        self._render_all = jax.jit(
            lambda states: render_frames2(gd, cfg, states, pack)
        )
        # render_human path: hi-res info "rgb" (vecgame.cpp:270-282, 367-375).
        # The reference paints the 512x512 frame with QPainter::Antialiasing;
        # here: 2x supersample (1024 nearest) + box filter, the standard
        # antialiasing equivalent for an axis-aligned sprite pipeline
        self._render_mode = render_mode
        if render_mode in ("rgb_array", "human"):
            from procgen_tpu.render.renderer import render_env

            def _hires_aa(s):
                big = render_env(gd, cfg, s, pack, res=1024).astype(jnp.uint16)
                pooled = (
                    big[0::2, 0::2] + big[1::2, 0::2]
                    + big[0::2, 1::2] + big[1::2, 1::2] + 2
                ) // 4
                return pooled.astype(jnp.uint8)

            self._render_hires = jax.jit(jax.vmap(_hires_aa))
        else:
            self._render_hires = None

        self._level_rng_seeds = _level_rng_seeds
        self.state = self._initial_state(rand_seed)
        self.state = self._reset_all(self.state)
        self._obs = self._render() if render else None

    # ------------------------------------------------------------------
    # functional API
    # ------------------------------------------------------------------

    def _initial_state(self, rand_seed: int) -> EnvState:
        tmpl = init_state_template(self.gd, self.cfg)
        batched = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (self.num,) + x.shape), tmpl
        )
        if self._level_rng_seeds is not None:
            # joint mode: the master RNG deals across the interleaved batch
            # (vecgame.cpp:309-314); ProcgenJointEnv passes each game its
            # own slots' draws
            seeds = jnp.asarray(self._level_rng_seeds, jnp.int32)
            assert seeds.shape == (self.num,)
        else:
            master = R.HostMT(rand_seed)
            seeds = jnp.asarray(
                [master.randint_full() for _ in range(self.num)], jnp.int32
            )
        return batched.replace(level_seed_rng=R.mt_seed(seeds))

    def reset_fn(self, state: EnvState) -> EnvState:
        """Pure batched reset (level generation for every env)."""
        return self._reset_all(state)

    def step_fn(self, state: EnvState, actions) -> EnvState:
        """Pure batched step with inline masked auto-reset."""
        return self._step_all(state, jnp.asarray(actions, jnp.int32))

    def render_fn(self, state: EnvState):
        return self._render_all(state)

    # ------------------------------------------------------------------
    # gym3-style stateful API (reference env.py / gym3.libenv.CEnv)
    # ------------------------------------------------------------------

    def _render(self):
        return self._render_all(self.state)

    def observe(self):
        # one round-trip for both scalars (remote backends pay per-transfer)
        rew, first = jax.device_get((self.state.reward, self.state.done))
        rew, first = np.asarray(rew), np.asarray(first)
        if self._obs is None and self._do_render:
            self._obs = self._render()
        ob = {"rgb": np.asarray(self._obs)} if self._do_render else {}
        return rew, ob, first

    def act(self, ac) -> None:
        self.state = self._step_all(self.state, jnp.asarray(ac, jnp.int32))
        self._obs = self._render() if self._do_render else None

    def get_info(self):
        prev_seed, prev_complete, seed = jax.device_get(
            (
                self.state.prev_level_seed,
                self.state.level_complete,
                self.state.current_level_seed,
            )
        )
        infos = [
            {
                "prev_level_seed": int(prev_seed[i]),
                "prev_level_complete": int(prev_complete[i]),
                "level_seed": int(seed[i]),
            }
            for i in range(self.num)
        ]
        if self._render_hires is not None:
            hires = np.asarray(self._render_hires(self.state))
            for i in range(self.num):
                infos[i]["rgb"] = hires[i]
        return infos

    # ------------------------------------------------------------------
    # state save/restore (env.py:140-153 / vecgame.cpp:437-457)
    # ------------------------------------------------------------------

    def get_state(self) -> list[bytes]:
        from procgen_tpu.utils import serialize as ser

        return ser.get_state(self.gd, self.cfg, self.state)

    def set_state(self, blobs: list[bytes]) -> None:
        from procgen_tpu.utils import serialize as ser

        assert len(blobs) == self.num
        self.state = ser.set_state(self.gd, self.cfg, self.state, blobs)
        # re-render so buffers are consistent (vecgame.cpp:455)
        self.state = jax.jit(
            lambda ss: ss.replace(
                static_layer=render_static2(self.gd, self.cfg, ss, self.pack)
            )
        )(self.state)
        self._obs = self._render() if self._do_render else None

    def callmethod(self, method: str, *args):
        """gym3 callmethod surface for get_state/set_state."""
        if method == "get_state":
            return self.get_state()
        if method == "set_state":
            self.set_state(args[0])
            return None
        raise AttributeError(method)

    @property
    def ob_space(self):
        return {"rgb": ("uint8", (64, 64, 3))}

    @property
    def ac_space(self):
        return ("discrete", 15)

    def get_combos(self):
        """The 15 action combos (reference env.py:156-172)."""
        return [
            ("LEFT", "DOWN"), ("LEFT",), ("LEFT", "UP"), ("DOWN",), (),
            ("UP",), ("RIGHT", "DOWN"), ("RIGHT",), ("RIGHT", "UP"),
            ("D",), ("A",), ("W",), ("S",), ("Q",), ("E",),
        ]

    def keys_to_act(self, keys_list):
        """Longest-match combo resolution (reference env.py:174-195)."""
        result = []
        for keys in keys_list:
            action = None
            max_len = -1
            for i, combo in enumerate(self.get_combos()):
                pressed = all(k in keys for k in combo)
                if pressed and max_len < len(combo):
                    action = i
                    max_len = len(combo)
            result.append(
                None if action is None else np.asarray([action], np.int32)
            )
        return result


class ProcgenJointEnv:
    """Joint multi-game env: comma-separated ``env_name`` runs game
    ``i % num_games`` in env slot ``i`` (vecgame.cpp:295-330; requires
    ``num % num_games == 0``).  Each game compiles its own program; the
    public surface interleaves them back into reference env order.
    """

    def __init__(self, num: int, env_name: str, *, rand_seed: Optional[int] = None, **kwargs):
        names = env_name.split(",")
        if num % len(names) != 0:
            raise ValueError(
                f"num ({num}) must be divisible by the number of games "
                f"({len(names)})"  # vecgame.cpp:299
            )
        if rand_seed is None:
            rand_seed = create_random_seed()
        self.num = num
        self.names = names
        k = len(names)
        # ONE master RNG deals per-env level seeds across the interleaved
        # batch (vecgame.cpp:301-314): env n runs game n % k and gets the
        # n-th draw; sub-env j owns slots j, j+k, j+2k, ...
        master = R.HostMT(rand_seed)
        all_seeds = [master.randint_full() for _ in range(num)]
        self.envs = [
            ProcgenTPUEnv(
                num=num // k, env_name=n, rand_seed=rand_seed,
                _level_rng_seeds=all_seeds[j::k], **kwargs
            )
            for j, n in enumerate(names)
        ]

    def _gather(self, pieces):
        """Interleave per-game arrays back to env order i = slot*k + game."""
        out = np.empty((self.num,) + pieces[0].shape[1:], pieces[0].dtype)
        k = len(self.envs)
        for j, arr in enumerate(pieces):
            out[j::k] = arr
        return out

    def observe(self):
        rews, obs, firsts = zip(*(e.observe() for e in self.envs))
        ob = {"rgb": self._gather([o["rgb"] for o in obs])} if obs[0] else {}
        return self._gather(list(rews)), ob, self._gather(list(firsts))

    def act(self, ac) -> None:
        ac = np.asarray(ac)
        k = len(self.envs)
        for j, e in enumerate(self.envs):
            e.act(ac[j::k])

    def get_info(self):
        k = len(self.envs)
        per = [e.get_info() for e in self.envs]
        out = [None] * self.num
        for j in range(k):
            for s, info in enumerate(per[j]):
                out[s * k + j] = info
        return out

    def get_state(self):
        k = len(self.envs)
        per = [e.get_state() for e in self.envs]
        out = [None] * self.num
        for j in range(k):
            for s, blob in enumerate(per[j]):
                out[s * k + j] = blob
        return out

    def set_state(self, blobs) -> None:
        k = len(self.envs)
        for j, e in enumerate(self.envs):
            e.set_state(blobs[j::k])

    def callmethod(self, method: str, *args):
        if method == "get_state":
            return self.get_state()
        if method == "set_state":
            self.set_state(args[0])
            return None
        raise AttributeError(method)

    @property
    def ob_space(self):
        return self.envs[0].ob_space

    @property
    def ac_space(self):
        return self.envs[0].ac_space


def make_procgen_env(num: int, env_name: str = "coinrun", **kwargs):
    """Factory handling the joint comma-list form of ``env_name``."""
    if "," in env_name:
        return ProcgenJointEnv(num, env_name, **kwargs)
    return ProcgenTPUEnv(num, env_name, **kwargs)
