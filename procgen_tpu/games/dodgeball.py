"""Dodgeball: Berzerk-like room arenas with lava walls and ball-throwing
enemies (reference: games/dodgeball.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import fmath as fm
from procgen_tpu import objects as O
from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode
from procgen_tpu.engine import entity_ops as eo
from procgen_tpu.engine.base import GameDef, base_game_reset, base_game_step
from procgen_tpu.games import register_game
from procgen_tpu.state import F32, I32, EnvState

COMPLETION_BONUS = 10.0
ENEMY_REWARD = 2.0

LAVA_WALL = 1
PLAYER_BALL = 3
ENEMY = 4
DOOR = 5
ENEMY_BALL = 6
DOOR_OPEN = 7
DUST_CLOUD = 8
OOB_WALL = 10

NUM_ENEMY_THEMES = 7
ENEMY_VEL = 0.05
PI = float(np.float32(np.pi))  # the reference's `const float PI` (cpp-utils.h:12)
# "const float BALL_V_ROT = PI * 0.23f" (dodgeball.cpp:24): an f32 x f32
# product, NOT the double-narrowed value (they differ by 1 ulp)
BALL_V_ROT = float(np.float32(np.float32(PI) * np.float32(0.23)))

MAX_ROOMS = 40  # 1 + 2 per split, <= 16 splits


class Dodgeball(GameDef):
    name = "dodgeball"
    mixrate = 0.5
    out_of_bounds_object = OOB_WALL
    background_group = "topdown_backgrounds"
    uses_pair_collisions = True
    uses_entity_reflect = True  # enemies bounce off lava-wall entities
    max_smart_entities = 24  # agent + <= 19 enemies
    agent_only_smart = False  # enemies are smart_step
    entity_rotations = "free"  # face_direction diagonals, spinning balls
    max_substeps = 8

    def __init__(self, cfg):
        mode = cfg.distribution_mode
        # dodgeball.cpp:279-313
        # constants follow the reference's float-with-double-literal
        # chains (dodgeball.cpp:270-312): e.g. hard thickness =
        # float(float(0.3f) * 1.5) = 0.45000002, not float32(0.45)
        thickness, enemy_r, exit_r = np.float32(0.3), np.float32(0.5), np.float32(0.75)
        ball_r, ball_vscale = np.float32(0.25), np.float32(0.25)
        max_extra_enemies = 3
        if mode == DistributionMode.easy:
            self.num_iterations = 2
            thickness = np.float32(thickness * np.float64(2))
            enemy_r = np.float32(enemy_r * np.float64(2))
            ball_r = np.float32(ball_r * np.float64(2))
            ball_vscale = np.float32(ball_vscale * np.float64(2))
            self.maxspeed = 0.75
            self.agent_r = 1.0
            exit_r = np.float32(exit_r * np.float64(2))
        elif mode == DistributionMode.hard:
            self.num_iterations = 4
            thickness = np.float32(thickness * np.float64(1.5))
            enemy_r = np.float32(enemy_r * np.float64(1.5))
            ball_r = np.float32(ball_r * np.float64(1.5))
            ball_vscale = np.float32(ball_vscale * np.float64(1.5))
            self.maxspeed = 0.5
            self.agent_r = 0.75
        elif mode == DistributionMode.extreme:
            self.num_iterations = 8
            self.maxspeed = 0.25
            self.agent_r = 0.4  # unchanged from the base spawn radius
        elif mode == DistributionMode.memory:
            self.num_iterations = 16
            thickness = np.float32(thickness * np.float64(1.5))
            enemy_r = np.float32(enemy_r * np.float64(1.5))
            ball_r = np.float32(ball_r * np.float64(1.5))
            ball_vscale = np.float32(ball_vscale * np.float64(1.5))
            self.maxspeed = 0.5
            self.agent_r = 0.75
            max_extra_enemies = 16
        else:
            raise ValueError(f"dodgeball does not support mode {mode}")
        self.memory = mode == DistributionMode.memory
        self.world_dim = 40 if self.memory else 20
        self.world_w_max = self.world_dim
        self.world_h_max = self.world_dim
        self.thickness = thickness
        self.enemy_r = enemy_r
        self.exit_r = exit_r
        self.ball_r = ball_r
        self.ball_vscale = ball_vscale
        self.max_extra_enemies = max_extra_enemies
        self.max_enemies = 3 + max_extra_enemies
        self.hard_min_dim = 4 * self.agent_r + 2 * thickness + 0.5
        self.min_dim = self.agent_r * 8 + 0.5
        # agent + walls + door + enemies + enemy balls + player balls + dust
        self.max_entities = (
            1 + self.num_iterations + 1 + 2 * self.max_enemies + 16 + 8
        )
        self.reset_max_draws = 1024

    def use_block_asset(self, type_):
        # dodgeball.cpp:153-155
        return type_ in (LAVA_WALL, DOOR, DOOR_OPEN)

    def asset_map(self, cfg):
        # dodgeball.cpp:50-90
        return {
            O.PLAYER: ["misc_assets/character12.png"],
            PLAYER_BALL: ["misc_assets/ball_soccer1.png"],
            # the reference lists character1-11 but only themes 0-6 are ever
            # drawn (enemy_theme = randn(7), dodgeball.cpp:359) and its own
            # MAX_IMAGE_THEMES is 10 -- ship the reachable 7
            ENEMY: [f"misc_assets/character{i}.png" for i in range(1, 8)],
            DOOR: ["misc_assets/blockRed.png"],
            ENEMY_BALL: ["misc_assets/ball_soccer2.png"],
            DOOR_OPEN: ["misc_assets/blockGreen.png"],
            LAVA_WALL: ["misc_assets/tileStone_slope2.png"],
            OOB_WALL: ["misc_assets/tileStone_slope2.png"],
            DUST_CLOUD: [f"misc_assets/spaceEffect{i}.png" for i in range(1, 10)],
        }

    def center_agent(self, cfg):
        return self.memory  # dodgeball.cpp:262

    def tile_ratio_for(self, img_type, rx=None, ry=None):
        # lava walls tile along their long axis (dodgeball.cpp:249-255)
        return jnp.where(
            img_type == LAVA_WALL,
            jnp.where(rx > ry, F32(1.0), F32(-1.0)),
            F32(0.0),
        )

    def entity_image_override(self, cfg, state):
        # image_for_type: open door once all enemies die (dodgeball.cpp:92-98)
        door_img = jnp.where(
            state.extra["num_enemies"] == 0, DOOR_OPEN, DOOR
        )
        return jnp.where(
            state.ents.type == DOOR, door_img, state.ents.image_type
        )

    def will_reflect(self, cfg, state, src_type, target_type):
        # dodgeball.cpp:100-102
        return (src_type == ENEMY) & (
            (target_type == LAVA_WALL) | (target_type == OOB_WALL)
        )

    def init_extra(self, cfg):
        return {
            "last_fire_time": jnp.asarray(0, I32),
            "num_enemies": jnp.asarray(0, I32),
        }

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        d = jnp.asarray(self.world_dim, I32)
        return state.replace(main_width=d, main_height=d)

    def _choose_vel(self, rs, active):
        """choose_vel (dodgeball.cpp:228-240): returns (rs, vx, vy, spawn_t)."""
        rs, s = R.rs_randn(rs, 2, active=active)
        vel = F32(ENEMY_VEL) * (s * 2 - 1).astype(F32)
        rs, axis = R.rs_randn(rs, 2, active=active)
        vx = jnp.where(axis == 0, vel, 0.0)
        vy = jnp.where(axis == 0, 0.0, vel)
        rs, st = R.rs_randn(rs, 50, active=active)
        return rs, vx, vy, st + 25

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        mw = F32(self.world_dim)
        mh = mw
        thickness = F32(self.thickness)
        min_dim = F32(self.min_dim)
        hard_min = F32(self.hard_min_dim)

        state = state.replace(
            ents=eo.write_slot(
                state.ents, eo.AGENT, rx=F32(self.agent_r), ry=F32(self.agent_r)
            )
        )

        # --- recursive room splitting (dodgeball.cpp:157-224, 315-323) ---
        rooms = jnp.zeros((MAX_ROOMS, 4), F32)
        rooms = rooms.at[0].set(jnp.asarray([0.0, 0.0, self.world_dim, self.world_dim], F32))
        count = jnp.asarray(1, I32)

        def add_room(rooms, count, rect, ok):
            rw, rh = rect[2], rect[3]
            ok = ok & ((rw >= min_dim) | (rh >= min_dim))
            ok = ok & (rw >= hard_min) & (rh >= hard_min)
            slot = jnp.minimum(count, MAX_ROOMS - 1)
            rooms = rooms.at[slot].set(jnp.where(ok, rect, rooms[slot]))
            return rooms, count + ok.astype(I32)

        for _ in range(self.num_iterations):
            nonempty = count > 0
            rs, idx = R.rs_randn(rs, jnp.maximum(count, 1), active=nonempty)
            room = rooms[idx]
            # ordered vector::erase
            ar = jnp.arange(MAX_ROOMS)
            src = jnp.where(ar >= idx, jnp.minimum(ar + 1, MAX_ROOMS - 1), ar)
            rooms = jnp.where(nonempty, rooms[src], rooms)
            count = count - nonempty.astype(I32)

            # split_room(room, thickness) (dodgeball.cpp:165-224)
            rs, u1 = R.rs_rand01(rs, active=nonempty)
            rs, u2 = R.rs_rand01(rs, active=nonempty)
            will_split_w = u1 < F32(0.5)
            choice2 = u2 < F32(0.5)
            rx, ry, rw, rh = room[0], room[1], room[2], room[3]
            will_split_w = jnp.where(rw < min_dim, False, will_split_w)
            will_split_w = jnp.where(rh < min_dim, True, will_split_w)
            rs, g = R.rs_randn(rs, 3, active=nonempty)
            gap = F32(0.25) * (g + 1).astype(F32)
            pct = 1 - gap

            # horizontal-split branch (wall along y)
            wy = jnp.where(choice2, ry, ry + (1 - pct) * rh)
            remy = jnp.where(choice2, ry + pct * rh, ry)
            wh = pct * rh
            # vertical-split branch (wall along x)
            wx = jnp.where(choice2, rx, rx + (1 - pct) * rw)
            remx = jnp.where(choice2, rx + pct * rw, rx)
            ww = pct * rw

            wall_x = jnp.where(will_split_w, wx + ww / 2, rx + rw / 2)
            wall_y = jnp.where(will_split_w, ry + rh / 2, wy + wh / 2)
            wall_rx = jnp.where(will_split_w, ww / 2, thickness)
            wall_ry = jnp.where(will_split_w, thickness, wh / 2)
            state, _ = eo.add_entity_rxy(
                state, wall_x, wall_y, 0.0, 0.0, wall_rx, wall_ry, LAVA_WALL,
                active=nonempty,
            )

            nextw = rw / 2 - thickness
            nexth = rh / 2 - thickness
            r1 = jnp.where(
                will_split_w,
                jnp.stack([wx, ry, ww, nexth]),
                jnp.stack([rx, wy, nextw, wh]),
            )
            r2 = jnp.where(
                will_split_w,
                jnp.stack([wx, ry + rh / 2 + thickness, ww, nexth]),
                jnp.stack([rx + rw / 2 + thickness, wy, nextw, wh]),
            )
            r3 = jnp.where(
                will_split_w,
                jnp.stack([remx, ry, rw - ww, rh]),
                jnp.stack([rx, remy, rw, rh - wh]),
            )
            rooms, count = add_room(rooms, count, r1, nonempty)
            rooms, count = add_room(rooms, count, r2, nonempty)
            rooms, count = add_room(rooms, count, r3, nonempty)

        # --- exit door on a random border wall (dodgeball.cpp:327-341) ---
        exit_r = F32(self.exit_r)
        doorlen = 2 * exit_r
        rs, wall_choice = R.rs_randn(rs, 4)
        box = jnp.select(
            [wall_choice == 0, wall_choice == 1, wall_choice == 2],
            [
                jnp.stack([F32(0.0), F32(0.0), mw, 2 * exit_r]),
                jnp.stack([F32(0.0), mh - 2 * exit_r, mw, 2 * exit_r]),
                jnp.stack([F32(0.0), F32(0.0), 2 * exit_r, mh]),
            ],
            jnp.stack([mw - 2 * exit_r, F32(0.0), 2 * exit_r, mh]),
        )
        horiz = wall_choice < 2
        d_rx = jnp.where(horiz, doorlen / 2, exit_r)
        d_ry = jnp.where(horiz, exit_r, doorlen / 2)
        rs, state, _ = eo.spawn_entity_rxy(
            rs, state, d_rx, d_ry, DOOR, box[0], box[1], box[2], box[3]
        )

        # reposition_agent (bag.cpp:531-539)
        arx = state.ents.rx[eo.AGENT]
        ary = state.ents.ry[eo.AGENT]

        def try_pos(rs, active):
            # "rand01() * (mw - 2*rx) + rx" with SEPARATE f32 roundings
            # (no FMA on ivybridge; r5 1000-step agent-y divergence)
            rs, ux = R.rs_rand01(rs, active=active)
            rs, uy = R.rs_rand01(rs, active=active)
            return (
                rs,
                fm.fmuladd32(cfg, ux, mw - 2 * arx, arx),
                fm.fmuladd32(cfg, uy, mh - 2 * ary, ary),
            )

        rs, ax, ay = try_pos(rs, True)

        def colliding(x, y):
            ents = state.ents
            m = eo.entity_vs_all(ents, x, y, arx, ary, margin=ents.collision_margin)
            return jnp.any(m & ents.alive & (ents.type != O.PLAYER))

        def body(_, carry):
            rs, x, y, act = carry
            act = act & colliding(x, y)
            rs, nx, ny = try_pos(rs, act)
            return rs, jnp.where(act, nx, x), jnp.where(act, ny, y), act

        rs, ax, ay, _ = jax.lax.fori_loop(0, 99, body, (rs, ax, ay, True))
        state = state.replace(
            ents=eo.write_slot(state.ents, eo.AGENT, x=ax, y=ay)
        )

        # enemies (dodgeball.cpp:345-367)
        rs, ne = R.rs_randn(rs, self.max_extra_enemies + 1)
        num_enemies = ne + 3
        for i in range(self.max_enemies):
            rs, state, _ = eo.spawn_entity_rxy(
                rs, state, self.enemy_r, self.enemy_r, ENEMY, 0.0, 0.0, mw, mh,
                active=i < num_enemies,
            )
        rs, enemy_theme = R.rs_randn(rs, NUM_ENEMY_THEMES)

        E = state.ents.capacity

        def cfg_body(i, carry):
            rs, ents = carry
            is_enemy = ents.alive[i] & (ents.type[i] == ENEMY)
            rs, vx, vy, spawn_t = self._choose_vel(rs, is_enemy)
            rot = fm.face_rotation(cfg, vx, vy)  # face_direction; v != 0 here
            ents = eo.write_slot_masked(
                ents, i, is_enemy,
                image_theme=enemy_theme, health=F32(1.0),
                fire_time=jnp.asarray(10, I32), spawn_time=spawn_t,
                collides_with_entities=jnp.asarray(True),
                smart_step=jnp.asarray(True),
                vx=vx, vy=vy, rotation=rot,
            )
            is_wall = ents.alive[i] & (ents.type[i] == LAVA_WALL)
            ents = eo.write_slot_masked(
                ents, i, is_wall, collides_with_entities=jnp.asarray(True)
            )
            return rs, ents

        rs, ents = jax.lax.fori_loop(0, E, cfg_body, (rs, state.ents))
        ents = eo.write_slot(ents, eo.AGENT, rotation=F32(0.0))  # face_direction(1, 0)
        state = state.replace(ents=ents)

        extra = dict(state.extra)
        extra["last_fire_time"] = jnp.asarray(0, I32)
        extra["num_enemies"] = num_enemies
        return state.replace(extra=extra), rs

    def handle_agent_collision(self, cfg, state: EnvState, mask) -> EnvState:
        # dodgeball.cpp:104-120
        t = state.ents.type
        deadly = mask & ((t == ENEMY) | (t == ENEMY_BALL) | (t == LAVA_WALL))
        door_hit = jnp.any(mask & (t == DOOR)) & (
            state.extra["num_enemies"] == 0
        )
        return state.replace(
            done=state.done | jnp.any(deadly) | door_hit,
            reward=state.reward + jnp.where(door_hit, F32(COMPLETION_BONUS), 0.0),
            level_complete=state.level_complete | door_hit,
        )

    def handle_collision_pairs(self, cfg, state: EnvState, pair_mask) -> EnvState:
        """dodgeball.cpp:122-151.  Phase A: ENEMY srcs (high slots first, as
        in the reference's descending sweep) each absorb their highest-index
        colliding player ball; health is 1 so one ball kills.  Phase B:
        LAVA_WALL srcs erase every remaining colliding ball."""
        E = state.ents.capacity
        idxs = jnp.arange(E)

        def body(k, st):
            i = E - 1 - k
            ents = st.ents
            is_enemy = (
                (ents.type[i] == ENEMY) & ents.alive[i] & ~ents.will_erase[i]
            )
            valid = (
                pair_mask[i] & ~ents.will_erase & is_enemy
                & (ents.type == PLAYER_BALL)
            )
            j = jnp.max(jnp.where(valid, idxs, -1))
            hit = j >= 0
            jc = jnp.maximum(j, 0)
            health = ents.health[i] - jnp.where(hit, 1.0, 0.0)
            kill = hit & (health <= 0)
            we = ents.will_erase
            we = we.at[jc].set(we[jc] | hit)  # ball consumed
            we = we.at[i].set(we[i] | kill)
            ents = ents.replace(
                health=ents.health.at[i].set(health), will_erase=we
            )
            reward = st.reward + jnp.where(kill, F32(ENEMY_REWARD), 0.0)
            # dust cloud (spawn_child + choose_step_random_theme)
            dust = eo.make_entity(
                ents.x[i], ents.y[i], 0.0, 0.0, ents.rx[i], ents.rx[i],
                DUST_CLOUD,
            )
            dust["vrot"] = F32(PI / 0.3)
            dust["grow_rate"] = F32(1.0 / 1.2)
            dust["expire_time"] = jnp.asarray(4, I32)
            dust["alpha_decay"] = F32(0.9)
            dust["image_theme"] = st.step_rand_int % 9
            ents, _ = eo.append_entity(ents, dust, active=kill)
            return st.replace(ents=ents, reward=reward)

        state = jax.lax.fori_loop(0, E, body, state)

        ents = state.ents
        wall_src = (ents.type == LAVA_WALL) & ents.alive
        hit_by_wall = jnp.any(pair_mask & wall_src[:, None], axis=0)
        is_ball = (ents.type == PLAYER_BALL) | (ents.type == ENEMY_BALL)
        erase = hit_by_wall & is_ball & ~ents.will_erase
        return state.replace(
            ents=ents.replace(will_erase=ents.will_erase | erase)
        )

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)
        extra = dict(state.extra)
        mw = F32(self.world_dim)
        mh = mw
        ball_vscale = F32(self.ball_vscale)

        # agent facing + fire (dodgeball.cpp:252-265... :424-437)
        vx = (state.last_move_action // 3 - 1).astype(F32)
        vy = (state.last_move_action % 3 - 1).astype(F32)
        moving = (vx != 0) | (vy != 0)
        rot = jnp.where(
            moving, fm.face_rotation(cfg, vx, vy), state.ents.rotation[eo.AGENT]
        )
        ents = eo.write_slot(state.ents, eo.AGENT, rotation=rot)

        fire = (state.special_action == 1) & (
            state.cur_time - extra["last_fire_time"] >= 7
        )
        ball = eo.make_entity(
            ents.x[eo.AGENT], ents.y[eo.AGENT], vx * ball_vscale,
            vy * ball_vscale, self.ball_r, self.ball_r, PLAYER_BALL,
        )
        ball["collides_with_entities"] = jnp.asarray(True)
        ball["expire_time"] = jnp.asarray(50, I32)
        ball["vrot"] = F32(BALL_V_ROT)
        ents, _ = eo.append_entity(ents, ball, active=fire)
        extra["last_fire_time"] = jnp.where(
            fire, state.cur_time, extra["last_fire_time"]
        )
        state = state.replace(ents=ents, extra=extra)

        # enemy AI sweep, reverse slot order with in-order RNG draws
        # (dodgeball.cpp:439-485)
        E = state.ents.capacity
        agent_x = state.ents.x[eo.AGENT]
        agent_y = state.ents.y[eo.AGENT]

        def body(k, carry):
            st, mt = carry
            i = E - 1 - k
            ents = st.ents
            is_enemy = ents.alive[i] & (ents.type[i] == ENEMY)

            respawn_vel = is_enemy & (ents.spawn_time[i] == 0)
            mt, vx_n, vy_n, st_n = _choose_vel_mt(mt, respawn_vel)
            evx = jnp.where(respawn_vel, vx_n, ents.vx[i])
            evy = jnp.where(respawn_vel, vy_n, ents.vy[i])
            spawn_t = jnp.where(
                respawn_vel, st_n,
                jnp.where(is_enemy, ents.spawn_time[i] - 1, ents.spawn_time[i]),
            )

            can_fire = is_enemy & (
                st.cur_time - ents.fire_time[i] >= 50
            )
            dx = ents.x[i] - agent_x
            dy = ents.y[i] - agent_y
            bvelx = jnp.where(ents.x[i] < agent_x, 1.0, -1.0)
            bvely = jnp.where(ents.y[i] < agent_y, 1.0, -1.0)
            fire_v = can_fire & (jnp.abs(dx) < 1)
            fire_h = can_fire & ~fire_v & (jnp.abs(dy) < 1)
            do_fire = fire_v | fire_h
            bvx = jnp.where(fire_v, 0.0, bvelx) * ball_vscale
            bvy = jnp.where(fire_v, bvely, 0.0) * ball_vscale
            eball = eo.make_entity(
                ents.x[i], ents.y[i], bvx, bvy, self.ball_r, self.ball_r,
                ENEMY_BALL,
            )
            eball["vrot"] = F32(BALL_V_ROT)
            eball["expire_time"] = jnp.asarray(50, I32)
            mt, ft = R.mt_randn(mt, 4, active=do_fire)
            evx = jnp.where(
                fire_v, 0.0, jnp.where(fire_h, bvelx * F32(ENEMY_VEL), evx)
            )
            evy = jnp.where(
                fire_v, bvely * F32(ENEMY_VEL), jnp.where(fire_h, 0.0, evy)
            )
            rot = jnp.where(
                is_enemy & ((evx != 0) | (evy != 0)),
                fm.face_rotation(cfg, evx, evy), ents.rotation[i],
            )
            ents = eo.write_slot_masked(
                ents, i, is_enemy,
                vx=evx, vy=evy, spawn_time=spawn_t, rotation=rot,
                fire_time=jnp.where(do_fire, st.cur_time + ft, ents.fire_time[i]),
            )
            ents, _ = eo.append_entity(ents, eball, active=do_fire)

            # balls die on the world border (dodgeball.cpp:478-484)
            is_ball = ents.alive[i] & (
                (ents.type[i] == PLAYER_BALL) | (ents.type[i] == ENEMY_BALL)
            )
            oob = (
                (ents.x[i] < ents.rx[i]) | (ents.x[i] > mw - ents.rx[i])
                | (ents.y[i] < ents.ry[i]) | (ents.y[i] > mh - ents.ry[i])
            )
            ents = ents.replace(
                will_erase=ents.will_erase.at[i].set(
                    ents.will_erase[i] | (is_ball & oob)
                )
            )
            return st.replace(ents=ents), mt

        state, mt = jax.lax.fori_loop(0, E, body, (state, state.rng))
        state = state.replace(rng=mt)

        # erase_if_needed (second pass, dodgeball.cpp:487)
        ents = eo.compact(state.ents, state.main_width, state.main_height)
        extra = dict(state.extra)
        extra["num_enemies"] = jnp.sum(
            (ents.alive & (ents.type == ENEMY)).astype(I32)
        )
        return state.replace(ents=ents, extra=extra)

    def serialize_extra(self, w, s, i):
        # dodgeball.cpp:446-465
        w.write_float(self.min_dim)
        w.write_float(self.hard_min_dim)
        w.write_float(self.ball_vscale)
        w.write_float(self.ball_r)
        w.write_int(int(s["extra.last_fire_time"][i]))
        w.write_int(int(s["extra.num_enemies"][i]))
        w.write_int(50)  # enemy_fire_delay

    def deserialize_extra(self, r):
        r.read_float()
        r.read_float()
        r.read_float()
        r.read_float()
        out = {"last_fire_time": r.read_int(), "num_enemies": r.read_int()}
        r.read_int()
        return out


def _choose_vel_mt(mt, active):
    """choose_vel on the per-step MT stream."""
    mt, s = R.mt_randn(mt, 2, active=active)
    vel = F32(ENEMY_VEL) * (s * 2 - 1).astype(F32)
    mt, axis = R.mt_randn(mt, 2, active=active)
    vx = jnp.where(axis == 0, vel, 0.0)
    vy = jnp.where(axis == 0, 0.0, vel)
    mt, st = R.mt_randn(mt, 50, active=active)
    return mt, vx, vy, st + 25


register_game("dodgeball")(Dodgeball)
