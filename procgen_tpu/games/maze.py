"""Maze: grid-step navigation to the cheese (reference: games/maze.cpp)."""

from __future__ import annotations

import jax.numpy as jnp

from procgen_tpu import fmath as fm
from procgen_tpu import objects as O
from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode
from procgen_tpu.engine import entity_ops as eo
from procgen_tpu.engine import physics as ph
from procgen_tpu.engine.base import GameDef, base_game_reset, base_game_step
from procgen_tpu.engine.levelgen import mazegen
from procgen_tpu.games import register_game
from procgen_tpu.state import F32, I32, EnvState

REWARD = 10.0  # maze.cpp:6
GOAL = 2  # maze.cpp:8


class MazeGame(GameDef):
    name = "maze"
    timeout = 500  # maze.cpp:18
    random_agent_start = False
    has_useful_vel_info = False
    out_of_bounds_object = O.WALL_OBJ
    visibility = 8.0
    max_entities = 2  # agent only (goal is a grid cell)
    max_substeps = 1  # grid_step game: exactly one sub-step

    background_group = "topdown_backgrounds"  # maze.cpp:26-28

    def asset_map(self, cfg):
        # maze.cpp:30-38
        return {
            O.WALL_OBJ: ["kenney/Ground/Sand/sandCenter.png"],
            GOAL: ["misc_assets/cheese.png"],
            O.PLAYER: ["kenney/Enemies/mouse_move.png"],
        }

    def center_agent(self, cfg):
        return self.force_center_agent

    def __init__(self, cfg):
        # maze.cpp:40-53
        mode = cfg.distribution_mode
        if mode == DistributionMode.easy:
            self.world_dim = 15
        elif mode == DistributionMode.hard:
            self.world_dim = 25
        elif mode == DistributionMode.memory:
            self.world_dim = 31
        else:
            raise ValueError(f"maze does not support mode {mode}")
        self.world_w_max = self.world_dim
        self.world_h_max = self.world_dim
        # maze.cpp:66: center_agent is forced on only in memory mode
        self.force_center_agent = mode == DistributionMode.memory

    def init_extra(self, cfg):
        return {
            "maze_dim": jnp.asarray(0, I32),
            "world_dim": jnp.asarray(self.world_dim, I32),
        }

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        wd = jnp.asarray(self.world_dim, I32)
        return state.replace(main_width=wd, main_height=wd)

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        state = state.replace(grid_step=jnp.asarray(True))

        wd = self.world_dim
        rs, r = R.rs_randn(rs, (wd - 1) // 2)
        maze_dim = r * 2 + 3
        margin = (jnp.asarray(wd, I32) - maze_dim) // 2

        # agent at maze corner (maze.cpp:68-71)
        half = F32(0.5)
        ax = margin.astype(F32) + half
        ents = eo.write_slot(
            state.ents, eo.AGENT, rx=half, ry=half, x=ax, y=ax
        )
        state = state.replace(ents=ents)

        res = mazegen.generate_maze(rs, maze_dim, wd)
        rs, res = mazegen.place_objects(res.rng, res, GOAL, 1, maze_dim, wd)

        # world grid: WALL everywhere, maze interior copied at margin offset
        # (maze.cpp:76-96; the extra border ring at margin-1 is already WALL).
        ys = jnp.arange(wd)[:, None]
        xs = jnp.arange(wd)[None, :]
        mi = xs - margin  # maze x
        mj = ys - margin  # maze y
        inside = (mi >= 0) & (mi < maze_dim) & (mj >= 0) & (mj < maze_dim)
        mval = res.grid[
            jnp.clip(mj + mazegen.MAZE_OFFSET, 0, wd + 1),
            jnp.clip(mi + mazegen.MAZE_OFFSET, 0, wd + 1),
        ]
        grid = jnp.where(inside, mval, O.WALL_OBJ).astype(I32)

        extra = dict(state.extra)
        extra["maze_dim"] = maze_dim
        return state.replace(grid=grid, extra=extra), rs

    def set_action_xy(self, cfg, state, move_action):
        # maze.cpp:99-103: horizontal wins over vertical
        avx, avy, avrot = GameDef.set_action_xy(self, cfg, state, move_action)
        avy = jnp.where(avx != 0, F32(0.0), avy)
        return avx, avy, avrot

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)

        ents = state.ents
        refl = jnp.where(
            state.action_vx > 0,
            True,
            jnp.where(state.action_vx < 0, False, ents.is_reflected[eo.AGENT]),
        )
        ents = eo.write_slot(ents, eo.AGENT, is_reflected=refl)
        state = state.replace(ents=ents)

        ix = ents.x[eo.AGENT].astype(I32)
        iy = ents.y[eo.AGENT].astype(I32)
        hit = ph.get_obj(state, ix, iy) == GOAL
        grid = state.grid.at[iy, ix].set(
            jnp.where(hit, O.SPACE, state.grid[iy, ix])
        )
        reward = state.reward + jnp.where(hit, F32(REWARD), F32(0.0))
        return state.replace(
            grid=grid,
            reward=reward,
            level_complete=state.level_complete | hit,
            done=reward > 0,  # maze.cpp:122 (overwrites base's OOB done)
        )


    def serialize_extra(self, w, s, i):
        # maze.cpp:125-129
        w.write_int(int(s["extra.maze_dim"][i]))
        w.write_int(int(s["extra.world_dim"][i]))

    def deserialize_extra(self, r):
        return {"maze_dim": r.read_int(), "world_dim": r.read_int()}


register_game("maze")(MazeGame)
