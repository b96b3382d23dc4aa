"""Climber: vertical platformer -- jump between platforms, collect all coins
(reference: games/climber.cpp)."""

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
from procgen_tpu.render import assets
from procgen_tpu.state import F32, I32, EnvState

COIN_REWARD = 1.0
COMPLETION_BONUS = 10.0

COIN = 1
ENEMY = 5
ENEMY1 = 6
ENEMY2 = 7
PLAYER_JUMP = 9
PLAYER_RIGHT1 = 12
PLAYER_RIGHT2 = 13
WALL_MID = 15
WALL_TOP = 16
ENEMY_BARRIER = 19

PATROL_RANGE = 4.0
NUM_WALL_THEMES = 4

GRAVITY = 0.2
MAX_JUMP = 1.5
AIR_CONTROL = 0.15

PLAYER_THEMES = ("Blue", "Green", "Grey", "Red")


class Climber(GameDef):
    name = "climber"
    out_of_bounds_object = WALL_MID
    background_group = "platform_backgrounds"
    agent_only_smart = False  # patrol enemies are smart_step
    uses_entity_reflect = False  # enemy reflect is off grid walls only
    maxspeed = 0.5
    max_jump = MAX_JUMP
    world_h_max = 64
    max_entities = 24  # agent + <= 10 enemies + <= 10 coins
    max_substeps = 8  # fall speed capped at 2 -> int(4*speed) <= 8
    entity_rotations = "none"
    grid_theme_count = NUM_WALL_THEMES

    def __init__(self, cfg):
        self.easy = cfg.distribution_mode == DistributionMode.easy
        self.world_w = 16 if self.easy else 20  # climber.cpp:233-236
        self.world_w_max = self.world_w
        self.enemy_prob = 0.2 if self.easy else 0.5
        self.enemy_aspect = F32(
            assets.aspect_ratio("platformer/enemySwimming_1.png")
        )

    def use_block_asset(self, type_):
        # climber.cpp:128-130
        return type_ in (WALL_MID, WALL_TOP)

    def asset_map(self, cfg):
        # climber.cpp:48-88
        def p(stem):
            return [f"platformer/player{t}_{stem}.png" for t in PLAYER_THEMES]

        return {
            O.PLAYER: p("stand"),
            PLAYER_JUMP: p("walk4"),
            PLAYER_RIGHT1: p("walk1"),
            PLAYER_RIGHT2: p("walk2"),
            WALL_TOP: [
                "platformer/tileBlue_05.png", "platformer/tileGreen_05.png",
                "platformer/tileYellow_06.png", "platformer/tileBrown_06.png",
            ],
            WALL_MID: [
                "platformer/tileBlue_08.png", "platformer/tileGreen_08.png",
                "platformer/tileYellow_09.png", "platformer/tileBrown_09.png",
            ],
            ENEMY1: ["platformer/enemySwimming_1.png"],
            ENEMY2: ["platformer/enemySwimming_2.png"],
            COIN: ["platformer/yellowCrystal.png"],
        }

    def grid_themed_types(self):
        # theme_for_grid_obj: walls use wall_theme (climber.cpp:101-106)
        return (WALL_MID, WALL_TOP)

    def grid_theme_state(self, cfg, state):
        return state.extra["wall_theme"]

    def init_extra(self, cfg):
        z = jnp.asarray(0, I32)
        return {
            "has_support": jnp.asarray(False),
            "facing_right": jnp.asarray(True),
            "coin_quota": z,
            "coins_collected": z,
            "wall_theme": z,
        }

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        return state.replace(
            main_width=jnp.asarray(self.world_w, I32),
            main_height=jnp.asarray(64, I32),
        )

    def choose_center(self, cfg, state):
        # climber.cpp:261-265: cy promotes to double via the /2.0 literal,
        # one narrowing into the float out-param
        ents = state.ents
        mw = state.main_width.astype(F32)
        # 5 * ry is a FLOAT multiply (int * float) before the promotion
        cy = fm.narrow(
            fm.wide(cfg, ents.y[eo.AGENT])
            + fm.wide(cfg, mw) / 2.0
            - fm.wide(cfg, 5 * ents.ry[eo.AGENT])
        )
        return mw / 2, cy, mw

    def is_blocked(self, cfg, state, src_type, target_type, is_horizontal):
        base = GameDef.is_blocked(self, cfg, state, src_type, target_type, is_horizontal)
        return base | (
            (src_type == O.PLAYER)
            & ((target_type == WALL_MID) | (target_type == WALL_TOP))
        )

    def will_reflect(self, cfg, state, src_type, target_type):
        # climber.cpp:108-110
        return (src_type == ENEMY) & (
            (target_type == WALL_MID)
            | (target_type == WALL_TOP)
            | (target_type == ENEMY_BARRIER)
        )

    def set_action_xy(self, cfg, state, move_action):
        # climber.cpp:267-289: jump only with support; updates facing/support
        avx = (move_action // 3 - 1).astype(F32)
        avy = jnp.maximum((move_action % 3 - 1).astype(F32), 0.0)

        extra = dict(state.extra)
        extra["facing_right"] = jnp.where(
            avx > 0, True, jnp.where(avx < 0, False, extra["facing_right"])
        )
        ents = state.ents
        ax, ay = ents.x[eo.AGENT], ents.y[eo.AGENT]
        arx, ary = ents.rx[eo.AGENT], ents.ry[eo.AGENT]
        b1 = ph.get_obj_from_floats(state, ax - (arx - 0.01), ay - (ary + 0.01))
        b2 = ph.get_obj_from_floats(state, ax + (arx - 0.01), ay - (ary + 0.01))

        def can_support(t):
            return (t == WALL_MID) | (t == WALL_TOP)  # OOB is WALL_MID

        has_support = can_support(b1) | can_support(b2)
        extra["has_support"] = has_support
        avy = jnp.where(has_support & (avy == 1), F32(1.0), F32(0.0))
        return avx, avy, F32(0.0), state.replace(extra=extra)

    def update_agent_velocity(self, cfg, state: EnvState) -> EnvState:
        # climber.cpp:112-124
        ents = state.ents
        has_support = state.extra["has_support"]
        mixrate_x = jnp.where(
            has_support, state.mixrate, state.mixrate * F32(AIR_CONTROL)
        )
        # separate f32 roundings for the mul+add chain (climber.cpp:113,
        # no FMA on ivybridge -- the r4 sweep's 1-ulp vx site)
        vx = fm.fadd32(
            cfg,
            (1 - mixrate_x) * ents.vx[eo.AGENT],
            mixrate_x * state.maxspeed * state.action_vx,
        )
        vy = jnp.where(state.action_vy > 0, state.max_jump, ents.vy[eo.AGENT])
        vy = jnp.where(
            ~has_support & (vy > -2), vy - F32(GRAVITY), vy
        )
        return state.replace(ents=eo.write_slot(ents, eo.AGENT, vx=vx, vy=vy))

    def entity_image_override(self, cfg, state):
        # image_for_type (climber.cpp:146-160) for the agent + enemy anim
        ents = state.ents
        has_support = state.extra["has_support"]
        vx = ents.vx[eo.AGENT]
        standing = (jnp.abs(vx) < 0.01) & (state.action_vx == 0) & has_support
        walk1 = (state.cur_time // 5 % 2 == 0) | ~has_support
        agent_img = jnp.where(
            ~has_support,
            PLAYER_JUMP,
            jnp.where(
                standing, O.PLAYER, jnp.where(walk1, PLAYER_RIGHT1, PLAYER_RIGHT2)
            ),
        )
        img = jnp.where(
            jnp.arange(ents.capacity) == eo.AGENT, agent_img, ents.image_type
        )
        return img

    def handle_agent_collision(self, cfg, state: EnvState, mask) -> EnvState:
        # climber.cpp:90-99
        t = state.ents.type
        dead = jnp.any(mask & (t == ENEMY))
        coins = mask & (t == COIN)
        n_coins = jnp.sum(coins.astype(I32))
        extra = dict(state.extra)
        extra["coins_collected"] = extra["coins_collected"] + n_coins
        return state.replace(
            ents=state.ents.replace(will_erase=state.ents.will_erase | coins),
            reward=state.reward + n_coins * F32(COIN_REWARD),
            done=state.done | dead,
            extra=extra,
        )

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        mw = self.world_w
        mh = 64

        ents = eo.write_slot(
            state.ents, eo.AGENT,
            rx=F32(0.5), ry=F32(0.5), x=F32(1.5), y=F32(1.5),
        )
        state = state.replace(ents=ents)
        rs, agent_theme = R.rs_randn(rs, 4)  # choose_random_theme(agent)
        state = state.replace(
            ents=eo.write_slot(state.ents, eo.AGENT, image_theme=agent_theme)
        )
        rs, wall_theme = R.rs_randn(rs, NUM_WALL_THEMES)

        # init_floor_and_walls (climber.cpp:162-167); grid is [y, x]
        grid = state.grid
        grid = grid.at[0, :mw].set(WALL_TOP)
        grid = grid.at[:mh, 0].set(WALL_MID)
        grid = grid.at[:mh, mw - 1].set(WALL_MID)
        grid = grid.at[mh - 1, :mw].set(WALL_MID)
        state = state.replace(grid=grid)

        # generate_platforms (climber.cpp:176-228)
        rs, difficulty = R.rs_randn(rs, 3)
        min_p = difficulty * difficulty + 1
        max_p = (difficulty + 1) * (difficulty + 1) + 1
        rs, np_r = R.rs_randn(rs, max_p - min_p + 1)
        num_platforms = np_r + min_p
        rs, cx0 = R.rs_randn(rs, mw - 4)
        curr_x = cx0 + 2
        curr_y = jnp.asarray(0, I32)
        margin_x = 3
        coin_quota = jnp.asarray(0, I32)
        # int(max_jump^2 / (2*gravity)) = 5
        max_dy = int(MAX_JUMP * MAX_JUMP / (2 * GRAVITY))

        MAX_PLATFORMS = 10  # difficulty 2: (2+1)^2 + 1
        MAX_PLAT_LEN = 11
        for i in range(MAX_PLATFORMS):
            on = i < num_platforms
            rs, dy_r = R.rs_randn(rs, max_dy - 3 + 1, active=on)
            delta_y = dy_r + 3

            can_spawn = on & (curr_x >= margin_x) & (curr_x <= mw - margin_x)
            rs, u_e = R.rs_rand01(rs, active=can_spawn)
            spawn_enemy = can_spawn & (u_e < F32(self.enemy_prob))
            # g++ evaluates add_entity's args right-to-left: the vx draw
            # precedes the y draw (climber.cpp:193)
            rs, vs = R.rs_randn(rs, 2, active=spawn_enemy)
            rs, dy_e = R.rs_randn(rs, 2, active=spawn_enemy)
            fields = eo.make_entity(
                curr_x.astype(F32) + 0.5,
                (curr_y + dy_e + 2).astype(F32) + 0.5,
                F32(0.15) * (vs * 2 - 1).astype(F32), 0.0, 0.5, 0.5, ENEMY,
            )
            fields["image_type"] = jnp.asarray(ENEMY1, I32)
            fields["smart_step"] = jnp.asarray(True)
            fields["climber_spawn_x"] = curr_x.astype(F32) + 0.5
            fields["ry"] = F32(0.5) / self.enemy_aspect  # match_aspect_ratio
            ents, _ = eo.append_entity(state.ents, fields, active=spawn_enemy)
            state = state.replace(ents=ents)

            curr_y = curr_y + jnp.where(on, delta_y, 0)
            rs, pl = R.rs_randn(rs, 10, active=on)
            plat_len = pl + 2
            rs, vxs = R.rs_randn(rs, 2, active=on)
            vx = vxs * 2 - 1
            vx = jnp.where(curr_x < margin_x, 1, vx)
            vx = jnp.where(curr_x > mw - margin_x, -1, vx)

            # candidates: consecutive in-bounds cells (break on first OOB)
            js = jnp.arange(MAX_PLAT_LEN)
            nxs = curr_x + (js + 1) * vx
            in_b = (nxs > 0) & (nxs < mw - 1) & (js < plat_len)
            valid = jnp.cumprod(in_b.astype(I32)).astype(bool)  # break semantics
            n_cand = jnp.sum(valid.astype(I32))
            grid = state.grid
            ycl = jnp.clip(curr_y, 0, 63)
            for j in range(MAX_PLAT_LEN):
                xj = jnp.clip(nxs[j], 0, mw - 1)
                grid = grid.at[ycl, xj].set(
                    jnp.where(on & valid[j], WALL_TOP, grid[ycl, xj])
                )
            state = state.replace(grid=grid)

            rs, u_c = R.rs_rand01(rs, active=on)
            place_coin = on & ((u_c < F32(0.5)) | (i == num_platforms - 1))
            rs, ci = R.rs_randn(rs, jnp.maximum(n_cand, 1), active=place_coin)
            coin_x = nxs[jnp.clip(ci, 0, MAX_PLAT_LEN - 1)]
            cfields = eo.make_entity(
                coin_x.astype(F32) + 0.5, curr_y.astype(F32) + 1.5, 0.0, 0.0,
                0.3, 0.3, COIN,
            )
            ents, _ = eo.append_entity(state.ents, cfields, active=place_coin)
            state = state.replace(ents=ents)
            coin_quota = coin_quota + place_coin.astype(I32)

            rs, ni = R.rs_randn(rs, jnp.maximum(n_cand, 1), active=on)
            curr_x = jnp.where(on, nxs[jnp.clip(ni, 0, MAX_PLAT_LEN - 1)], curr_x)

        extra = dict(state.extra)
        extra["wall_theme"] = wall_theme
        extra["coin_quota"] = coin_quota
        extra["coins_collected"] = jnp.asarray(0, I32)
        extra["has_support"] = jnp.asarray(False)
        extra["facing_right"] = jnp.asarray(True)
        return state.replace(extra=extra), rs

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)
        ents = state.ents

        refl = jnp.where(
            state.action_vx > 0, False,
            jnp.where(state.action_vx < 0, True, ents.is_reflected[eo.AGENT]),
        )
        ents = eo.write_slot(ents, eo.AGENT, is_reflected=refl)

        # enemy patrol + animation (climber.cpp:295-311); vectorized, no RNG
        is_enemy = ents.alive & (ents.type == ENEMY)
        over = ents.x > ents.climber_spawn_x + PATROL_RANGE
        under = ents.x < ents.climber_spawn_x - PATROL_RANGE
        vx = jnp.where(
            is_enemy & over, -jnp.abs(ents.vx),
            jnp.where(is_enemy & under, jnp.abs(ents.vx), ents.vx),
        )
        anim = jnp.where(state.cur_time // 5 % 2 == 0, ENEMY1, ENEMY2)
        image_type = jnp.where(is_enemy, anim, ents.image_type)
        is_refl = jnp.where(is_enemy, vx < 0, ents.is_reflected)
        ents = ents.replace(vx=vx, image_type=image_type, is_reflected=is_refl)

        done_all = state.extra["coin_quota"] == state.extra["coins_collected"]
        return state.replace(
            ents=ents,
            done=state.done | done_all,
            reward=state.reward + jnp.where(done_all, F32(COMPLETION_BONUS), 0.0),
            level_complete=state.level_complete | done_all,
        )

    def serialize_extra(self, w, s, i):
        # climber.cpp:320-329
        w.write_bool(bool(s["extra.has_support"][i]))
        w.write_bool(bool(s["extra.facing_right"][i]))
        w.write_int(int(s["extra.coin_quota"][i]))
        w.write_int(int(s["extra.coins_collected"][i]))
        w.write_int(int(s["extra.wall_theme"][i]))
        w.write_float(GRAVITY)
        w.write_float(AIR_CONTROL)

    def deserialize_extra(self, r):
        out = {}
        out["has_support"] = r.read_bool()
        out["facing_right"] = r.read_bool()
        out["coin_quota"] = r.read_int()
        out["coins_collected"] = r.read_int()
        out["wall_theme"] = r.read_int()
        r.read_float()
        r.read_float()
        return out


register_game("climber")(Climber)
