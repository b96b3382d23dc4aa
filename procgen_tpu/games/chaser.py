"""Chaser: MsPacman-style orb collection with chasing enemies (reference:
games/chaser.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import fmath as fm
from procgen_tpu import objects as O
from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode
from procgen_tpu.engine import entity_ops as eo
from procgen_tpu.engine import rand_util as ru
from procgen_tpu.engine.base import GameDef, base_game_reset, base_game_step
from procgen_tpu.engine.levelgen import mazegen
from procgen_tpu.games import register_game
from procgen_tpu.render import pack as packmod
from procgen_tpu.state import F32, I32, EnvState

ORB_REWARD = 0.04  # chaser.cpp:10
COMPLETION_BONUS = 10.0
ORB_DIM = 0.3

LARGE_ORB = 2
ENEMY_WEAK = 3
ENEMY_EGG = 4
MAZE_WALL = 5
ENEMY = 6
ENEMY3 = 8

MARKER = 1001
ORB = 1002

EAT_TIMEOUT = 75  # chaser.cpp:43
EGG_TIMEOUT = 50


class ChaserGame(GameDef):
    name = "chaser"
    mixrate = 1.0  # chaser.cpp:40
    maxspeed = 0.5
    has_useful_vel_info = False
    agent_only_smart = False  # enemies are smart_step
    grid_dynamic = True  # orbs are grid cells eaten during play
    max_substeps = 4  # speeds <= sqrt(.5), num_sub_steps is always 4
    max_entities = 12  # <= 5 orbs + 5 eggs/enemies + agent + 1 spawn slack
    background_group = "topdown_simple_backgrounds"  # chaser.cpp:50-52

    def __init__(self, cfg):
        mode = cfg.distribution_mode
        if mode == DistributionMode.easy:
            self.maze_dim, self.total_enemies, self.extra_orb_sign = 11, 3, 0
        elif mode == DistributionMode.hard:
            self.maze_dim, self.total_enemies, self.extra_orb_sign = 13, 3, -1
        elif mode == DistributionMode.extreme:
            self.maze_dim, self.total_enemies, self.extra_orb_sign = 19, 5, 1
        else:
            raise ValueError(f"chaser does not support mode {mode}")
        self.world_w_max = self.maze_dim
        self.world_h_max = self.maze_dim
        # worst case: all eggs hatch in one step (egg + child coexist until
        # the next compact) + orbs + agent
        self.max_entities = 1 + (1 + max(self.extra_orb_sign, 0)) * 4 + 2 * self.total_enemies + 1

    def use_block_asset(self, type_):
        # chaser.cpp:74-76
        return type_ == MAZE_WALL

    def asset_map(self, cfg):
        # chaser.cpp:54-72
        return {
            O.PLAYER: ["misc_assets/enemyFloating_1b.png"],
            ENEMY: ["misc_assets/enemyFlying_1.png"],
            ENEMY + 1: ["misc_assets/enemyFlying_2.png"],
            ENEMY3: ["misc_assets/enemyFlying_3.png"],
            LARGE_ORB: ["misc_assets/yellowCrystal.png"],
            ENEMY_WEAK: ["misc_assets/enemyWalking_1b.png"],
            ENEMY_EGG: ["misc_assets/enemySpikey_1b.png"],
            MAZE_WALL: ["misc_assets/tileStone_slope.png"],
        }

    def center_agent(self, cfg):
        return False  # chaser.cpp:172

    def grid_color_rect_lut(self, cfg):
        # draw_grid_obj: ORB = centered green square (chaser.cpp:111-117)
        dim = np.zeros((packmod.GRID_TYPE_LUT_SIZE,), np.float32)
        rgb = np.zeros((packmod.GRID_TYPE_LUT_SIZE, 3), np.float32)
        dim[ORB] = ORB_DIM
        rgb[ORB] = (0.0, 255.0, 0.0)
        return dim, rgb

    def init_extra(self, cfg):
        return {
            "eat_time": jnp.asarray(0, I32),
            "total_orbs": jnp.asarray(0, I32),
            "orbs_collected": jnp.asarray(0, I32),
        }

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        d = jnp.asarray(self.maze_dim, I32)
        return state.replace(main_width=d, main_height=d)

    def is_blocked(self, cfg, state, src_type, target_type, is_horizontal):
        base = GameDef.is_blocked(self, cfg, state, src_type, target_type, is_horizontal)
        return base | (target_type == MAZE_WALL)

    def update_agent_velocity(self, cfg, state: EnvState) -> EnvState:
        # chaser.cpp:78-88: latched full-speed velocity
        ents = state.ents
        vx = jnp.where(
            state.action_vx != 0, state.maxspeed * state.action_vx,
            ents.vx[eo.AGENT],
        )
        vy = jnp.where(
            state.action_vy != 0, state.maxspeed * state.action_vy,
            ents.vy[eo.AGENT],
        )
        # cpp-utils sign() maps BOTH IEEE zeros to +0.0 (vx may hold -0.0
        # after a fully-blocked step, bag.cpp:654-655)
        vx = fm.fsign(vx) * state.maxspeed
        vy = fm.fsign(vy) * state.maxspeed
        return state.replace(ents=eo.write_slot(ents, eo.AGENT, vx=vx, vy=vy))

    def _can_eat(self, state):
        return state.cur_time - state.extra["eat_time"] < EAT_TIMEOUT

    def entity_image_override(self, cfg, state):
        # image_for_type (chaser.cpp:97-109)
        rem = (state.cur_time // 2) % 4
        rem = jnp.where(rem == 3, 1, rem)
        img = jnp.where(self._can_eat(state), ENEMY_WEAK, ENEMY + rem)
        return jnp.where(
            state.ents.type == ENEMY, img, state.ents.image_type
        )

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        md = self.maze_dim

        ents = eo.write_slot(state.ents, eo.AGENT, rx=F32(0.5), ry=F32(0.5))
        state = state.replace(ents=ents)

        rs, mgrid = mazegen.generate_maze_no_dead_ends(rs, md, md)
        mval = mgrid[1 : md + 1, 1 : md + 1]  # [y, x]
        grid = jnp.where(mval == O.WALL_OBJ, MAZE_WALL, mval).astype(I32)
        state = state.replace(grid=grid)

        rs, extra_quad = R.rs_randn(rs, 4)

        # quadrant orb placement in x-major cell order (chaser.cpp:179-232)
        k_lin = jnp.arange(md * md)
        ex = k_lin // md
        ey = k_lin % md
        space_xmaj = grid[ey, ex] == O.SPACE
        quad = (ex >= md / 2.0).astype(I32) * 2 + (ey >= md / 2.0).astype(I32)

        for q in range(4):
            n_orbs = 1 + jnp.where(extra_quad == q, self.extra_orb_sign, 0)
            qmask = space_xmaj & (quad == q)
            n_q = jnp.sum(qmask.astype(I32))
            rs, picks = ru.simple_choose_dyn(
                rs, n_q, n_orbs, md * md, max(1 + max(self.extra_orb_sign, 0), 1)
            )
            for s in range(1 + max(self.extra_orb_sign, 0)):
                active = s < n_orbs
                pos = ru.choose_nth_masked(qmask, picks[s])
                cx = ex[pos].astype(F32)
                cy = ey[pos].astype(F32)
                fields = eo.make_entity(
                    cx + 0.5, cy + 0.5, 0.0, 0.0, 0.4, 0.4, LARGE_ORB
                )
                ents, _ = eo.append_entity(state.ents, fields, active=active)
                gy = ey[pos]
                gx = ex[pos]
                g = state.grid.at[gy, gx].set(
                    jnp.where(active, MARKER, state.grid[gy, gx])
                )
                state = state.replace(ents=ents, grid=g)

        # agent + enemy eggs from the remaining SPACE cells, ascending
        # y-major order (get_cells_with_type, chaser.cpp:234-252)
        space_flat = (state.grid == O.SPACE).reshape(-1)
        n_free = jnp.sum(space_flat.astype(I32))
        total_orbs = n_free
        rs, picks = ru.simple_choose_dyn(
            rs, n_free, 1 + self.total_enemies, md * md, 1 + self.total_enemies
        )
        start = ru.choose_nth_masked(space_flat, picks[0])
        state = state.replace(
            ents=eo.write_slot(
                state.ents, eo.AGENT,
                x=(start % md).astype(F32) + 0.5,
                y=(start // md).astype(F32) + 0.5,
            )
        )
        for i in range(self.total_enemies):
            cell = ru.choose_nth_masked(space_flat, picks[i + 1])
            state = self._spawn_egg(state, cell, md, True)

        # SPACE -> ORB (incl. egg cells), orb markers -> SPACE
        grid = state.grid
        grid = jnp.where(grid == O.SPACE, ORB, grid)
        grid = jnp.where(grid == MARKER, O.SPACE, grid)

        extra = dict(state.extra)
        extra["eat_time"] = jnp.asarray(-EAT_TIMEOUT, I32)
        extra["total_orbs"] = total_orbs
        extra["orbs_collected"] = jnp.asarray(0, I32)
        return state.replace(grid=grid, extra=extra), rs

    def _spawn_egg(self, state, cell, md, active):
        # spawn_egg (chaser.cpp:259-262)
        fields = eo.make_entity(
            (cell % md).astype(F32) + 0.5, (cell // md).astype(F32) + 0.5,
            0.0, 0.0, 0.5, 0.5, ENEMY_EGG,
        )
        fields["health"] = F32(EGG_TIMEOUT)
        ents, _ = eo.append_entity(state.ents, fields, active=active)
        return state.replace(ents=ents)

    def agent_collision_phase(self, cfg, state: EnvState) -> EnvState:
        """Sequential reverse sweep (chaser.cpp:119-133): eating a large orb
        flips eat-mode for enemies processed later in the same sweep."""
        E = state.ents.capacity
        cur_time = state.cur_time

        def body(k, carry):
            ents, eat_time, reward, done = carry
            i = E - 1 - k
            coll = (
                (jnp.abs(ents.x[i] - ents.x[eo.AGENT])
                 < ents.rx[i] + ents.rx[eo.AGENT] + ents.collision_margin[i])
                & (jnp.abs(ents.y[i] - ents.y[eo.AGENT])
                   < ents.ry[i] + ents.ry[eo.AGENT] + ents.collision_margin[i])
            )
            hit = ents.alive[i] & coll & (i != eo.AGENT)
            t = ents.type[i]
            is_orb = hit & (t == LARGE_ORB)
            eat_time = jnp.where(is_orb, cur_time, eat_time)
            reward = reward + jnp.where(is_orb, F32(ORB_REWARD), F32(0.0))
            can_eat = cur_time - eat_time < EAT_TIMEOUT
            is_enemy = hit & (t == ENEMY)
            done = done | (is_enemy & ~can_eat)
            erase = is_orb | (is_enemy & can_eat)
            ents = ents.replace(
                will_erase=ents.will_erase.at[i].set(ents.will_erase[i] | erase)
            )
            return ents, eat_time, reward, done

        ents, eat_time, reward, done = jax.lax.fori_loop(
            0, E, body,
            (state.ents, state.extra["eat_time"], state.reward, state.done),
        )
        extra = dict(state.extra)
        extra["eat_time"] = eat_time
        return state.replace(ents=ents, extra=extra, reward=reward, done=done)

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)
        md = self.maze_dim
        ents = state.ents
        E = ents.capacity
        can_eat = self._can_eat(state)
        vscale = jnp.where(can_eat, F32(0.25), F32(0.5))  # chaser.cpp:293-294
        sri = state.step_rand_int

        is_egg = ents.alive & (ents.type == ENEMY_EGG)
        is_enemy = ents.alive & (ents.type == ENEMY)
        num_enemies = jnp.sum((is_egg | is_enemy).astype(I32))

        # egg countdown (chaser.cpp:303-315)
        health = jnp.where(is_egg, ents.health - 1, ents.health)
        hatch = is_egg & (health == 0)
        ents = ents.replace(
            health=health, will_erase=ents.will_erase | hatch
        )

        # enemy chase AI, vectorized over slots (chaser.cpp:316-363)
        x = ents.x - 0.5
        y = ents.y - 0.5
        ecx = x.astype(I32)  # int() truncation
        ecy = y.astype(I32)
        at_junction = (
            jnp.abs(x - jnp.round(x)) + jnp.abs(y - jnp.round(y)) < 0.01
        )
        decide = is_enemy & (((ents.vx == 0) & (ents.vy == 0)) | at_junction)
        aggressive = sri % 2 == 0
        dist_scale = jnp.where(can_eat, -1, 1)
        is_space = state.grid != MAZE_WALL  # is_space_vec semantics

        acx = ents.x[eo.AGENT].astype(I32)
        acy = ents.y[eo.AGENT].astype(I32)

        pvx = (x - fm.fsign(ents.vx)).astype(I32)
        pvy = (y - fm.fsign(ents.vy)).astype(I32)
        prev_ok = (pvx >= 0) & (pvx < md) & (pvy >= 0) & (pvy < md)

        # neighbors in get_adjacent push order: left, up, down, right
        n_dx = jnp.asarray([-1, 0, 0, 1], I32)[None, :]
        n_dy = jnp.asarray([0, -1, 1, 0], I32)[None, :]
        nx = ecx[:, None] + n_dx  # (E, 4)
        ny = ecy[:, None] + n_dy
        in_grid = (nx >= 0) & (nx < md) & (ny >= 0) & (ny < md)
        sp = is_space[jnp.clip(ny, 0, md - 1), jnp.clip(nx, 0, md - 1)]
        not_prev = ~(prev_ok[:, None] & (nx == pvx[:, None]) & (ny == pvy[:, None]))
        cand = in_grid & sp & not_prev
        mdist = (jnp.abs(nx - acx) + jnp.abs(ny - acy)) * dist_scale
        min_d = jnp.min(jnp.where(cand, mdist, 2 * md), axis=1, keepdims=True)
        cand = jnp.where(aggressive, cand & (mdist == min_d), cand)
        cnt = jnp.sum(cand.astype(I32), axis=1)
        j = sri % jnp.maximum(cnt, 1)
        pos = jnp.cumsum(cand.astype(I32), axis=1) - 1
        sel = jnp.argmax(cand & (pos == j[:, None]), axis=1)
        rows = jnp.arange(E)
        tx = nx[rows, sel].astype(F32)
        ty = ny[rows, sel].astype(F32)
        apply = decide & (cnt > 0)
        new_vx = jnp.where(apply, (tx - x) * vscale, ents.vx)
        new_vy = jnp.where(apply, (ty - y) * vscale, ents.vy)
        ents = ents.replace(vx=new_vx, vy=new_vy)
        state = state.replace(ents=ents)

        # hatched children append in reverse slot order (chaser.cpp:307-313)
        def hatch_body(k, st):
            i = E - 1 - k
            fields = eo.make_entity(
                st.ents.x[i], st.ents.y[i], 0.0, 0.0, 0.5, 0.5, ENEMY
            )
            fields["smart_step"] = jnp.asarray(True)
            new_ents, _ = eo.append_entity(st.ents, fields, active=hatch[i])
            return st.replace(ents=new_ents)

        state = jax.lax.fori_loop(0, E, hatch_body, state)

        # egg respawn (chaser.cpp:366-369)
        space_flat = is_space.reshape(-1)
        n_free = jnp.sum(space_flat.astype(I32))
        cell = ru.choose_nth_masked(space_flat, sri % jnp.maximum(n_free, 1))
        state = self._spawn_egg(
            state, cell, md, num_enemies < self.total_enemies
        )

        # orb collection at the agent cell (chaser.cpp:371-385)
        at_orb = state.grid[acy, acx] == ORB
        grid = state.grid.at[acy, acx].set(
            jnp.where(at_orb, O.SPACE, state.grid[acy, acx])
        )
        extra = dict(state.extra)
        extra["orbs_collected"] = extra["orbs_collected"] + at_orb.astype(I32)
        reward = state.reward + jnp.where(at_orb, F32(ORB_REWARD), F32(0.0))
        full = extra["orbs_collected"] == extra["total_orbs"]
        reward = reward + jnp.where(full, F32(COMPLETION_BONUS), F32(0.0))
        return state.replace(
            grid=grid, extra=extra, reward=reward,
            done=state.done | full,
            level_complete=state.level_complete | full,
        )

    def serialize_extra(self, w, s, i):
        # chaser.cpp:388-412; free_cells/is_space_vec are derived views of
        # the grid (cells != MAZE_WALL never change during play)
        md = self.maze_dim
        grid = s["grid"][i][:md, :md].reshape(-1)
        is_space = grid != MAZE_WALL
        w.write_vector_int([int(c) for c in np.nonzero(is_space)[0]])
        w.write_vector_bool([bool(b) for b in is_space])
        w.write_int(EAT_TIMEOUT)
        w.write_int(EGG_TIMEOUT)
        w.write_int(int(s["extra.eat_time"][i]))
        w.write_int(self.total_enemies)
        w.write_int(int(s["extra.total_orbs"][i]))
        w.write_int(int(s["extra.orbs_collected"][i]))
        w.write_int(md)

    def deserialize_extra(self, r):
        r.read_vector_int()  # free_cells (derived)
        r.read_vector_bool()  # is_space_vec (derived)
        r.read_int()  # eat_timeout
        r.read_int()  # egg_timeout
        eat_time = r.read_int()
        r.read_int()  # total_enemies
        total_orbs = r.read_int()
        orbs_collected = r.read_int()
        r.read_int()  # maze_dim
        return {
            "eat_time": eat_time,
            "total_orbs": total_orbs,
            "orbs_collected": orbs_collected,
        }


register_game("chaser")(ChaserGame)
