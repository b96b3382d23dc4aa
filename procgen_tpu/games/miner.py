"""Miner: Boulderdash-style dig/gravity game (reference: games/miner.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import fmath as fm
from procgen_tpu import objects as O
from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode
from procgen_tpu.engine import entity_ops as eo
from procgen_tpu.engine import physics as ph
from procgen_tpu.engine import rand_util as ru
from procgen_tpu.engine.base import GameDef, base_game_reset, base_game_step
from procgen_tpu.games import register_game
from procgen_tpu.render import pack as render_pack
from procgen_tpu.state import F32, I32, EnvState

COMPLETION_BONUS = 10.0
DIAMOND_REWARD = 1.0

BOULDER = 1
DIAMOND = 2
MOVING_BOULDER = 3
MOVING_DIAMOND = 4
ENEMY = 5
EXIT = 6
DIRT = 9
OOB_WALL = 10


class MinerGame(GameDef):
    name = "miner"
    has_useful_vel_info = False
    out_of_bounds_object = OOB_WALL
    visibility = 8.0
    max_entities = 2  # agent + exit (no enemies are ever spawned)
    max_substeps = 1  # grid_step
    grid_dynamic = True  # grid mutates every step (digging / gravity)
    background_group = "platform_backgrounds"

    def asset_map(self, cfg):
        # miner.cpp:42-56
        return {
            O.PLAYER: ["misc_assets/robot_greenDrive1.png"],
            BOULDER: ["misc_assets/elementStone007.png"],
            DIAMOND: ["misc_assets/gemBlue.png"],
            EXIT: ["misc_assets/window.png"],
            DIRT: ["misc_assets/dirt.png"],
            OOB_WALL: ["misc_assets/tile_bricksGrey.png"],
        }

    def grid_image_lut(self, cfg):
        # miner.cpp:85-93: moving variants render with the base sprite
        lut = render_pack.default_grid_image_lut()
        lut[MOVING_BOULDER] = BOULDER
        lut[MOVING_DIAMOND] = DIAMOND
        return lut

    def center_agent(self, cfg):
        return self.force_center_agent

    def __init__(self, cfg):
        mode = cfg.distribution_mode
        if mode == DistributionMode.easy:
            dim = 10
        elif mode == DistributionMode.hard:
            dim = 20
        elif mode == DistributionMode.memory:
            dim = 35
        else:
            raise ValueError(f"miner does not support mode {mode}")
        self.world_dim = dim
        self.world_w_max = dim
        self.world_h_max = dim
        self.force_center_agent = mode == DistributionMode.memory
        area = dim * dim
        # miner.cpp:143-148
        self.num_diamonds = int(12 / 400.0 * area)
        self.num_boulders = int(80 / 400.0 * area)
        self.n_picks = self.num_diamonds + self.num_boulders + 1
        # draws: 2 (base) + picks w/ rejection tail; generous block
        self.reset_max_draws = max(256, 2 * self.n_picks + 64)

    def init_extra(self, cfg):
        return {"diamonds_remaining": jnp.asarray(0, I32)}

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        wd = jnp.asarray(self.world_dim, I32)
        return state.replace(main_width=wd, main_height=wd)

    def is_blocked(self, cfg, state, src_type, target_type, is_horizontal):
        # miner.cpp:58-65
        base = GameDef.is_blocked(self, cfg, state, src_type, target_type, is_horizontal)
        player_block = jnp.logical_and(
            src_type == O.PLAYER,
            (target_type == BOULDER)
            | (target_type == MOVING_BOULDER)
            | (target_type == OOB_WALL),
        )
        return base | player_block

    def handle_agent_collision(self, cfg, state: EnvState, mask) -> EnvState:
        # miner.cpp:71-83 (no ENEMY is ever spawned; EXIT only)
        ents = state.ents
        exit_hit = jnp.any(mask & (ents.type == EXIT))
        win = exit_hit & (state.extra["diamonds_remaining"] == 0)
        return state.replace(
            reward=state.reward + jnp.where(win, F32(COMPLETION_BONUS), 0.0),
            level_complete=state.level_complete | win,
            done=state.done | win,
        )

    def set_action_xy(self, cfg, state, move_action):
        # miner.cpp:99-103
        avx, avy, avrot = GameDef.set_action_xy(self, cfg, state, move_action)
        avy = jnp.where(avx != 0, F32(0.0), avy)
        return avx, avy, avrot

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        state = state.replace(grid_step=jnp.asarray(True))
        W = self.world_dim
        area = W * W

        ents = eo.write_slot(state.ents, eo.AGENT, rx=F32(0.5), ry=F32(0.5))
        state = state.replace(ents=ents)

        # miner.cpp:149-155
        rs, picks = ru.simple_choose(rs, area, self.n_picks)
        agent_cell = picks[0]
        ax = (agent_cell % W).astype(F32) + 0.5
        ay = (agent_cell // W).astype(F32) + 0.5
        state = state.replace(
            ents=eo.write_slot(state.ents, eo.AGENT, x=ax, y=ay)
        )

        # grid: DIRT everywhere, then diamonds/boulders (miner.cpp:157-169)
        flat = jnp.full((area,), DIRT, I32)
        d_cells = picks[1 : 1 + self.num_diamonds]
        b_cells = picks[1 + self.num_diamonds :]
        flat = flat.at[d_cells].set(DIAMOND)
        flat = flat.at[b_cells].set(BOULDER)

        # dirt snapshot BEFORE the agent clearing (miner.cpp:171)
        dirt_mask = flat == DIRT

        flat = flat.at[agent_cell].set(O.SPACE)
        # clear boulders in the 3x3 around the agent (miner.cpp:175-183)
        agent_x = agent_cell % W
        agent_y = agent_cell // W
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                ox = agent_x + di
                oy = agent_y + dj
                inb = (ox >= 0) & (ox < W) & (oy >= 0) & (oy < W)
                cell = jnp.clip(oy * W + ox, 0, area - 1)
                hit = inb & (flat[cell] == BOULDER)
                flat = flat.at[cell].set(jnp.where(hit, DIRT, flat[cell]))

        # exit placement (miner.cpp:185-199): dirt cells (snapshot order)
        # whose current above-neighbor is DIRT or OOB
        idxs = jnp.arange(area)
        above = idxs + W
        above_obj = jnp.where(above < area, flat[jnp.clip(above, 0, area - 1)], OOB_WALL)
        cand = dirt_mask & ((above_obj == DIRT) | (above_obj == OOB_WALL))
        n_cand = jnp.sum(cand.astype(I32))
        rs, pick = R.rs_randn(rs, jnp.maximum(n_cand, 1))
        exit_cell = ru.choose_nth_masked(cand, pick)
        flat = flat.at[exit_cell].set(O.SPACE)
        ex = (exit_cell % W).astype(F32) + 0.5
        ey = (exit_cell // W).astype(F32) + 0.5
        fields = eo.make_entity(ex, ey, 0.0, 0.0, 0.5, 0.5, EXIT)
        fields["render_z"] = jnp.asarray(-1, I32)
        ents, _ = eo.append_entity(state.ents, fields)
        state = state.replace(ents=ents, grid=flat.reshape(W, W))

        # diamonds_remaining is deliberately NOT set here: the reference
        # member (miner.cpp:23) is only recomputed by the game_step grid
        # sweep (miner.cpp:305) and carries its previous value across
        # resets until the first step.
        return state, rs

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)
        W = self.world_dim
        area = W * W
        ents = state.ents

        # facing (miner.cpp:250-253)
        refl = jnp.where(
            state.action_vx > 0,
            False,
            jnp.where(state.action_vx < 0, True, ents.is_reflected[eo.AGENT]),
        )
        state = state.replace(
            ents=eo.write_slot(ents, eo.AGENT, is_reflected=refl)
        )

        # handle_push (miner.cpp:232-245)
        flat = state.grid.reshape(-1)
        ax = state.ents.x[eo.AGENT]
        ay = state.ents.y[eo.AGENT]
        agent_idx = ay.astype(I32) * W + ax.astype(I32)
        agentx = agent_idx % W
        vx0 = state.ents.vx[eo.AGENT]
        pr = (
            (state.action_vx == 1) & (vx0 == 0) & (agentx < W - 2)
            & (flat[jnp.clip(agent_idx + 1, 0, area - 1)] == BOULDER)
            & (flat[jnp.clip(agent_idx + 2, 0, area - 1)] == O.SPACE)
        )
        pl = (
            ~pr & (state.action_vx == -1) & (vx0 == 0) & (agentx > 1)
            & (flat[jnp.clip(agent_idx - 1, 0, area - 1)] == BOULDER)
            & (flat[jnp.clip(agent_idx - 2, 0, area - 1)] == O.SPACE)
        )
        flat = flat.at[jnp.clip(agent_idx + 1, 0, area - 1)].set(
            jnp.where(pr, O.SPACE, flat[jnp.clip(agent_idx + 1, 0, area - 1)])
        )
        flat = flat.at[jnp.clip(agent_idx + 2, 0, area - 1)].set(
            jnp.where(pr, BOULDER, flat[jnp.clip(agent_idx + 2, 0, area - 1)])
        )
        flat = flat.at[jnp.clip(agent_idx - 1, 0, area - 1)].set(
            jnp.where(pl, O.SPACE, flat[jnp.clip(agent_idx - 1, 0, area - 1)])
        )
        flat = flat.at[jnp.clip(agent_idx - 2, 0, area - 1)].set(
            jnp.where(pl, BOULDER, flat[jnp.clip(agent_idx - 2, 0, area - 1)])
        )
        new_ax = ax + jnp.where(pr, 1.0, jnp.where(pl, -1.0, 0.0))
        state = state.replace(
            ents=eo.write_slot(state.ents, eo.AGENT, x=new_ax)
        )

        # dig (miner.cpp:257-265)
        aix = new_ax.astype(I32)
        aiy = ay.astype(I32)
        cell = jnp.clip(aiy * W + aix, 0, area - 1)
        obj_here = flat[cell]
        reward = state.reward + jnp.where(
            obj_here == DIAMOND, F32(DIAMOND_REWARD), 0.0
        )
        dug = (obj_here == DIRT) | (obj_here == DIAMOND)
        flat = flat.at[cell].set(jnp.where(dug, O.SPACE, obj_here))

        # gravity/roll sweep, ascending cell order with in-place writes
        # (miner.cpp:267-303); inherently sequential: falls write the already
        # -swept below row and rolls write the not-yet-swept right neighbor.
        agent_idx2 = ((ay - 0.5) * W + (new_ax - 0.5)).astype(I32)
        # is_free uses get_agent_index() (miner.cpp:95-97, 224-226) on the
        # post-push agent position
        agent_idx_free = aiy * W + aix
        done0 = jnp.asarray(False)

        def is_free(flat, idx):
            inb = (idx >= 0) & (idx < area)
            v = jnp.where(inb, flat[jnp.clip(idx, 0, area - 1)], OOB_WALL)
            return (v == O.SPACE) & (agent_idx_free != idx)

        def body(idx, carry):
            flat, diamonds, done = carry
            obj = flat[idx]
            obj_x = idx % W
            is_obj = (obj == BOULDER) | (obj == MOVING_BOULDER) | (
                obj == DIAMOND
            ) | (obj == MOVING_DIAMOND)
            stat = jnp.where(
                obj == MOVING_DIAMOND, DIAMOND,
                jnp.where(obj == MOVING_BOULDER, BOULDER, obj),
            )
            moving_t = jnp.where(
                obj == DIAMOND, MOVING_DIAMOND,
                jnp.where(obj == BOULDER, MOVING_BOULDER, obj),
            )
            diamonds = diamonds + (stat == DIAMOND).astype(I32)

            below = idx - W
            inb_below = below >= 0
            obj2 = jnp.where(
                inb_below, flat[jnp.clip(below, 0, area - 1)], OOB_WALL
            )
            agent_below = agent_idx2 == below
            is_round2 = (obj2 == BOULDER) | (obj2 == MOVING_BOULDER) | (
                obj2 == DIAMOND
            ) | (obj2 == MOVING_DIAMOND)

            fall = is_obj & (obj2 == O.SPACE) & ~agent_below
            crush = is_obj & ~fall & agent_below & (
                (obj == MOVING_BOULDER) | (obj == MOVING_DIAMOND)
            )
            roll_l = (
                is_obj & ~fall & ~crush & is_round2 & (obj_x > 0)
                & is_free(flat, idx - 1) & is_free(flat, idx - W - 1)
            )
            roll_r = (
                is_obj & ~fall & ~crush & ~roll_l & is_round2 & (obj_x < W - 1)
                & is_free(flat, idx + 1) & is_free(flat, idx - W + 1)
            )
            # the crush branch leaves the cell untouched (miner.cpp:291-292)
            settle = is_obj & ~fall & ~crush & ~roll_l & ~roll_r

            done = done | crush
            flat = flat.at[idx].set(
                jnp.where(fall | roll_l | roll_r, O.SPACE,
                          jnp.where(settle, stat, flat[idx]))
            )
            flat = flat.at[jnp.clip(below, 0, area - 1)].set(
                jnp.where(fall, moving_t, flat[jnp.clip(below, 0, area - 1)])
            )
            flat = flat.at[jnp.clip(idx - 1, 0, area - 1)].set(
                jnp.where(roll_l, stat, flat[jnp.clip(idx - 1, 0, area - 1)])
            )
            flat = flat.at[jnp.clip(idx + 1, 0, area - 1)].set(
                jnp.where(roll_r, stat, flat[jnp.clip(idx + 1, 0, area - 1)])
            )
            return flat, diamonds, done

        flat, diamonds, crushed = jax.lax.fori_loop(
            0, area, body, (flat, jnp.asarray(0, I32), done0)
        )

        extra = dict(state.extra)
        extra["diamonds_remaining"] = diamonds
        # no ENEMY entities exist (never spawned, miner.cpp), so the per-
        # enemy randn(6) loop (miner.cpp:307-313) consumes no draws.
        return state.replace(
            grid=flat.reshape(W, W),
            reward=reward,
            done=state.done | crushed,
            extra=extra,
        )


    def serialize_extra(self, w, s, i):
        # miner.cpp:316-319
        w.write_int(int(s["extra.diamonds_remaining"][i]))

    def deserialize_extra(self, r):
        return {"diamonds_remaining": r.read_int()}


register_game("miner")(MinerGame)
