"""Ninja: charged-jump platformer with throwing stars and bombs (reference:
games/ninja.cpp)."""

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
from procgen_tpu.engine.base import GameDef, base_game_reset, base_game_step
from procgen_tpu.games import register_game
from procgen_tpu.state import F32, I32, EnvState

GOAL_REWARD = 10.0

GOAL = 1
BOMB = 6
THROWING_STAR = 7
PLAYER_JUMP = 9
PLAYER_RIGHT1 = 12
PLAYER_RIGHT2 = 13
FIRE = 14
WALL_MID = 20
NUM_WALL_THEMES = 3

GRAVITY = 0.2
AIR_CONTROL = 0.15
PI = float(np.float32(np.pi))  # the reference's `const float PI` (cpp-utils.h:12)

CHARGE_COLOR = (66.0, 245.0, 135.0)  # ninja.cpp:168


class Ninja(GameDef):
    name = "ninja"
    out_of_bounds_object = WALL_MID
    background_group = "platform_backgrounds"
    maxspeed = 0.5
    world_w_max = 64
    world_h_max = 64
    max_entities = 16  # agent + goal + <= 6 stars + explosions
    max_substeps = 8
    entity_rotations = "none"
    grid_theme_count = NUM_WALL_THEMES
    block_zeroes_velocity_types = (THROWING_STAR,)
    agent_only_smart = False  # throwing stars are smart_step
    max_smart_entities = 8
    smart_entities_grid_collide = True  # stars stick/explode on walls

    def __init__(self, cfg):
        self.easy = cfg.distribution_mode == DistributionMode.easy
        self.max_jump = 1.25 if self.easy else 1.5
        self.jump_charge_inc = 1.0 if self.easy else 0.25
        self.visibility = 10.0 if self.easy else 16.0

    def use_block_asset(self, type_):
        # ninja.cpp:135-137
        return type_ == WALL_MID

    def asset_map(self, cfg):
        # ninja.cpp:45-76
        return {
            WALL_MID: [
                "misc_assets/tile_bricksGrey.png",
                "misc_assets/tile_bricksGrown.png",
                "misc_assets/tile_bricksRed.png",
            ],
            GOAL: [f"platformer/shroom{i}.png" for i in range(1, 7)],
            O.PLAYER: ["platformer/zombie_idle.png"],
            PLAYER_JUMP: ["platformer/zombie_jump.png"],
            PLAYER_RIGHT1: ["platformer/zombie_walk1.png"],
            PLAYER_RIGHT2: ["platformer/zombie_walk2.png"],
            BOMB: ["misc_assets/bomb.png"],
            THROWING_STAR: ["misc_assets/saw.png"],
            FIRE: ["misc_assets/bomb.png"],
            O.EXPLOSION: ["misc_assets/explosion1.png"],
            O.EXPLOSION + 1: ["misc_assets/explosion2.png"],
            O.EXPLOSION + 2: ["misc_assets/explosion3.png"],
            O.EXPLOSION + 3: ["misc_assets/explosion4.png"],
            O.EXPLOSION + 4: ["misc_assets/explosion5.png"],
        }

    def grid_themed_types(self):
        return (WALL_MID,)

    def grid_theme_state(self, cfg, state):
        return state.extra["wall_theme"]

    def init_extra(self, cfg):
        return {
            "has_support": jnp.asarray(False),
            "facing_right": jnp.asarray(True),
            "last_fire_time": jnp.asarray(0, I32),
            "wall_theme": jnp.asarray(0, I32),
            "jump_charge": jnp.asarray(0.0, F32),
        }

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        return state.replace(
            main_width=jnp.asarray(64, I32), main_height=jnp.asarray(64, I32)
        )

    def hud_color_rects(self, cfg, state):
        # jump-charge bar (ninja.cpp:166-175)
        bar_h = 3 * state.extra["jump_charge"]
        vis = state.visibility
        rects = jnp.stack(
            [jnp.stack([F32(0.25), vis - 0.5 - bar_h, F32(0.5), bar_h])]
        )
        colors = jnp.asarray([CHARGE_COLOR], F32)
        return rects, colors

    def is_blocked(self, cfg, state, src_type, target_type, is_horizontal):
        base = GameDef.is_blocked(self, cfg, state, src_type, target_type, is_horizontal)
        blocked_types = (src_type == O.PLAYER) | (src_type == THROWING_STAR)
        return base | (blocked_types & (target_type == WALL_MID))

    def set_action_xy(self, cfg, state, move_action):
        # ninja.cpp:347-377
        avx = (move_action // 3 - 1).astype(F32)
        avy = jnp.maximum((move_action % 3 - 1).astype(F32), 0.0)
        extra = dict(state.extra)
        extra["facing_right"] = jnp.where(
            avx > 0, True, jnp.where(avx < 0, False, extra["facing_right"])
        )
        ents = state.ents
        # probe coords promote to double via the .01 literals
        # (ninja.cpp:358-359); the f32 probe can floor() into the wrong cell
        ax, ay = fm.wide(cfg, ents.x[eo.AGENT]), fm.wide(cfg, ents.y[eo.AGENT])
        arx, ary = fm.wide(cfg, ents.rx[eo.AGENT]), fm.wide(cfg, ents.ry[eo.AGENT])
        b1 = ph.get_obj_from_floats(
            state, fm.narrow(ax - (arx - 0.01)), fm.narrow(ay - (ary + 0.01))
        )
        b2 = ph.get_obj_from_floats(
            state, fm.narrow(ax + (arx - 0.01)), fm.narrow(ay - (ary + 0.01))
        )
        has_support = (b1 == WALL_MID) | (b2 == WALL_MID)
        extra["has_support"] = has_support
        charging = has_support & (avy == 1)
        avy = jnp.where(charging, F32(1.0), F32(0.0))
        charge = extra["jump_charge"]
        charge = jnp.where(
            charging, jnp.minimum(charge + F32(self.jump_charge_inc), 1.0), charge
        )
        charge = jnp.where(has_support, charge, F32(0.0))
        extra["jump_charge"] = charge
        return avx, avy, F32(0.0), state.replace(extra=extra)

    def update_agent_velocity(self, cfg, state: EnvState) -> EnvState:
        # ninja.cpp:108-124: jump releases when the key lifts
        ents = state.ents
        extra = dict(state.extra)
        has_support = extra["has_support"]
        mixrate_x = jnp.where(
            has_support, state.mixrate, state.mixrate * F32(AIR_CONTROL)
        )
        # "(1 - mixrate_x) * vx + mixrate_x * maxspeed * action_vx"
        # (ninja.cpp:110): two f32 products and a separate f32 add
        vx = fm.fadd32(
            cfg,
            (1 - mixrate_x) * ents.vx[eo.AGENT],
            mixrate_x * state.maxspeed * state.action_vx,
        )
        release = (state.action_vy < 1) & (extra["jump_charge"] > 0)
        vy = jnp.where(
            release, extra["jump_charge"] * state.max_jump, ents.vy[eo.AGENT]
        )
        extra["jump_charge"] = jnp.where(release, 0.0, extra["jump_charge"])
        vy = jnp.where(~has_support & (vy > -2), vy - F32(GRAVITY), vy)
        return state.replace(
            ents=eo.write_slot(ents, eo.AGENT, vx=vx, vy=vy), extra=extra
        )

    def entity_image_override(self, cfg, state):
        # image_for_type (ninja.cpp:154-164)
        ents = state.ents
        has_support = state.extra["has_support"]
        vx = ents.vx[eo.AGENT]
        standing = (jnp.abs(vx) < 0.01) & (state.action_vx == 0) & has_support
        walk1 = (state.cur_time // 5 % 2 == 0) | ~has_support
        agent_img = jnp.where(
            standing, O.PLAYER, jnp.where(walk1, PLAYER_RIGHT1, PLAYER_RIGHT2)
        )
        return jnp.where(
            jnp.arange(ents.capacity) == eo.AGENT, agent_img, ents.image_type
        )

    def handle_agent_collision(self, cfg, state: EnvState, mask) -> EnvState:
        # ninja.cpp:78-87
        t = state.ents.type
        dead = jnp.any(mask & (t == O.EXPLOSION))
        goal = jnp.any(mask & (t == GOAL))
        return state.replace(
            done=state.done | dead | goal,
            reward=state.reward + jnp.where(goal, F32(GOAL_REWARD), 0.0),
            level_complete=state.level_complete | goal,
        )

    def handle_grid_collision(self, cfg, state, ent_idx, cell_type, cx, cy, valid):
        # ninja.cpp:89-106
        ents = state.ents
        is_player = ents.type[ent_idx] == O.PLAYER
        is_star = ents.type[ent_idx] == THROWING_STAR
        deadly = valid & is_player & ((cell_type == FIRE) | (cell_type == BOMB))
        star_bomb = valid & is_star & (cell_type == BOMB)
        star_wall = valid & is_star & (cell_type == WALL_MID)

        xc = jnp.clip(cx, 0, state.grid.shape[1] - 1)
        yc = jnp.clip(cy, 0, state.grid.shape[0] - 1)
        grid = state.grid.at[yc, xc].set(
            jnp.where(star_bomb, O.SPACE, state.grid[yc, xc])
        )
        expl = eo.make_entity(
            cx.astype(F32) + 0.5, cy.astype(F32) + 0.5, 0.0, 0.0, 0.5, 0.5,
            O.EXPLOSION,
        )
        ents = ents.replace(
            will_erase=ents.will_erase.at[ent_idx].set(
                ents.will_erase[ent_idx] | star_bomb | star_wall
            )
        )
        ents, _ = eo.append_entity(ents, expl, active=star_bomb)
        return state.replace(
            grid=grid, ents=ents, done=state.done | deadly
        )

    def _fill(self, grid, x, y, dx, dy, v):
        """fill_elem with traced bounds over the 64x64 grid ([y, x])."""
        xs = jnp.arange(64)[None, :]
        ys = jnp.arange(64)[:, None]
        m = (xs >= x) & (xs < x + dx) & (ys >= y) & (ys < y + dy)
        return jnp.where(m, v, grid)

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        mw = mh = 64
        difficulty_max = 3

        state = state.replace(
            ents=eo.write_slot(
                state.ents, eo.AGENT, rx=F32(0.5), ry=F32(0.5),
                x=F32(1.5), y=F32(mh / 2 + 0.5),
            ),
            visibility=jnp.asarray(self.visibility, F32),
        )

        rs, dr = R.rs_randn(rs, difficulty_max)
        difficulty = dr + 1
        rs, wall_theme = R.rs_randn(rs, NUM_WALL_THEMES)

        grid = state.grid
        # init_floor_and_walls (ninja.cpp:187-192)
        grid = self._fill(grid, 0, 0, mw, 1, WALL_MID)
        grid = self._fill(grid, 0, 0, 1, mh, WALL_MID)
        grid = self._fill(grid, mw - 1, 0, 1, mh, WALL_MID)
        grid = self._fill(grid, 0, mh - 1, mw, 1, WALL_MID)

        # generate_coin_to_the_right (ninja.cpp:194-305)
        if self.easy:
            min_gap_base = -1  # clamped at 0 after difficulty-1
            min_plat_w, inc_dy = 3, 2
        else:
            min_gap_base = 0
            min_plat_w, inc_dy = 1, 4
        min_gap = jnp.maximum(difficulty - 1 + min_gap_base, 0)
        bomb_prob = F32(0.25) * (difficulty - 1).astype(F32)
        max_gap_inc = jnp.where(difficulty == 1, 1, 2)

        rs, ns = R.rs_randn(rs, difficulty)
        num_sections = ns + difficulty
        start_x = 5
        curr_x = jnp.asarray(start_x, I32)
        curr_y = jnp.asarray(mh // 2, I32)
        min_y = curr_y
        max_dy_f = self.max_jump * self.max_jump / (2 * GRAVITY)
        max_dy = int(max_dy_f - 0.5)

        grid = self._fill(grid, 0, 0, start_x, curr_y, WALL_MID)
        grid = self._fill(grid, 0, curr_y + 8, start_x, mh - curr_y - 8, WALL_MID)

        MAX_SECTIONS = 5  # difficulty 3: randn(3) + 3
        for i in range(MAX_SECTIONS):
            s_on = i < num_sections
            prev_x = curr_x
            prev_y = curr_y
            rs, ne = R.rs_randn(rs, 2, active=s_on)
            num_edges = ne + 1
            max_y = jnp.asarray(-1, I32)
            last_edge_y = jnp.asarray(-1, I32)

            for j in range(2):
                e_on = s_on & (j < num_edges)
                cx_try = prev_x + j
                fits = cx_try + 15 < mw
                e_on = e_on & fits  # break
                curr_x = jnp.where(e_on, cx_try, curr_x)
                cy = prev_y
                rs, dyr = R.rs_randn(rs, inc_dy, active=e_on)
                dy = dyr + 1 + difficulty // 3
                dy = jnp.minimum(dy, max_dy)
                high = cy >= mh - 15
                can_flip = e_on & ~high & (cy >= 5)
                rs, u_f = R.rs_rand01(rs, active=can_flip)
                flip = high | (can_flip & (u_f < F32(0.4)))
                dy = jnp.where(flip, -dy, dy)
                cy = cy + dy
                cy = jnp.maximum(cy, 3)
                cy = jnp.where(
                    jnp.abs(cy - last_edge_y) <= 1, last_edge_y + 2, cy
                )
                rs, dxr = R.rs_randn(rs, 3, active=e_on)
                dx = min_plat_w + dxr
                g2 = self._fill(grid, curr_x, cy - 1, dx, 1, WALL_MID)
                grid = jnp.where(e_on, g2, grid)
                curr_x = jnp.where(e_on, curr_x + dx, curr_x)
                rs, gapr = R.rs_randn(
                    rs, jnp.maximum(max_gap_inc + 1, 1), active=e_on
                )
                curr_x = jnp.where(e_on, curr_x + min_gap + gapr, curr_x)
                max_y = jnp.where(e_on & (cy > max_y), cy, max_y)
                min_y = jnp.where(e_on & (cy < min_y), cy, min_y)
                last_edge_y = jnp.where(e_on, cy, last_edge_y)
                curr_y = jnp.where(e_on, cy, curr_y)

            rs, u_b = R.rs_rand01(rs, active=s_on)
            place_bomb = s_on & (u_b < bomb_prob)
            rs, bx = R.rs_randn(
                rs, jnp.maximum(curr_x - prev_x + 1, 1), active=place_bomb
            )
            bxx = jnp.clip(bx + prev_x, 0, 63)
            byy = jnp.clip(max_y + 2, 0, 63)
            grid = grid.at[byy, bxx].set(
                jnp.where(place_bomb, BOMB, grid[byy, bxx])
            )

            ceiling_start = max_y - 1 + 11
            g2 = self._fill(
                grid, prev_x, ceiling_start, curr_x - prev_x, mh - ceiling_start,
                WALL_MID,
            )
            grid = jnp.where(s_on, g2, grid)

        # goal + final columns (ninja.cpp:293-304)
        rs, goal_theme = R.rs_randn(rs, 6)
        gfields = eo.make_entity(
            curr_x.astype(F32) + 0.5, curr_y.astype(F32) + 0.5, 0.0, 0.0,
            0.5, 0.5, GOAL,
        )
        gfields["image_theme"] = goal_theme
        ents, _ = eo.append_entity(state.ents, gfields, active=True)
        state = state.replace(ents=ents)

        grid = self._fill(grid, curr_x, curr_y - 1, 1, 1, WALL_MID)
        grid = self._fill(grid, curr_x, curr_y + 6, 1, mh - curr_y - 6, WALL_MID)
        fire_y = jnp.maximum(min_y - 2, 1)
        grid = self._fill(grid, start_x, 0, mw - start_x, fire_y, WALL_MID)
        grid = self._fill(grid, start_x, fire_y, mw - start_x, 1, FIRE)
        grid = self._fill(grid, curr_x + 1, 0, mw - curr_x - 1, mh, WALL_MID)

        extra = dict(state.extra)
        extra["wall_theme"] = wall_theme
        extra["has_support"] = jnp.asarray(False)
        extra["facing_right"] = jnp.asarray(True)
        extra["last_fire_time"] = jnp.asarray(0, I32)
        extra["jump_charge"] = jnp.asarray(0.0, F32)
        return state.replace(grid=grid, extra=extra), rs

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)
        ents = state.ents
        extra = dict(state.extra)

        refl = jnp.where(
            state.action_vx > 0, False,
            jnp.where(state.action_vx < 0, True, ents.is_reflected[eo.AGENT]),
        )
        ents = eo.write_slot(ents, eo.AGENT, is_reflected=refl)

        # throwing stars at 4 angles (ninja.cpp:385-410)
        fire = (state.special_action > 0) & (
            state.cur_time - extra["last_fire_time"] >= 3
        )
        sa = state.special_action
        theta = jnp.select(
            [sa == 1, sa == 2, sa == 3, sa == 4],
            [F32(0.0), F32(PI / 4), F32(PI / 2), F32(-PI / 4)],
            F32(0.0),
        )
        theta = jnp.where(ents.is_reflected[eo.AGENT], PI - theta, theta)
        # "bullet_vel * cos(theta)" with bullet_vel = 1: game TUs resolve
        # cos/sin to the C double functions; the double chain narrows at the
        # Entity ctor floats (ninja.cpp:389-405)
        star = eo.make_entity(
            ents.x[eo.AGENT], ents.y[eo.AGENT],
            fm.narrow(fm.dcos(cfg, theta)), fm.narrow(fm.dsin(cfg, theta)),
            0.25, 0.25, THROWING_STAR,
        )
        star["collides_with_entities"] = jnp.asarray(True)
        star["expire_time"] = jnp.asarray(15, I32)
        star["smart_step"] = jnp.asarray(True)
        ents, _ = eo.append_entity(ents, star, active=fire)
        extra["last_fire_time"] = jnp.where(
            fire, state.cur_time, extra["last_fire_time"]
        )
        return state.replace(ents=ents, extra=extra)

    def serialize_extra(self, w, s, i):
        # ninja.cpp:413-434
        w.write_bool(bool(s["extra.has_support"][i]))
        w.write_bool(bool(s["extra.facing_right"][i]))
        w.write_int(int(s["extra.last_fire_time"][i]))
        w.write_int(int(s["extra.wall_theme"][i]))
        w.write_float(GRAVITY)
        w.write_float(AIR_CONTROL)
        w.write_float(s["extra.jump_charge"][i])
        w.write_float(self.jump_charge_inc)

    def deserialize_extra(self, r):
        out = {}
        out["has_support"] = r.read_bool()
        out["facing_right"] = r.read_bool()
        out["last_fire_time"] = r.read_int()
        out["wall_theme"] = r.read_int()
        r.read_float()
        r.read_float()
        out["jump_charge"] = r.read_float()
        r.read_float()
        return out


register_game("ninja")(Ninja)
