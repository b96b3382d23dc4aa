"""CaveFlyer: Asteroids-style ship navigating procedurally carved caves
(reference: games/caveflyer.cpp)."""

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
from procgen_tpu.engine.levelgen import roomgen
from procgen_tpu.fmath import dmul
from procgen_tpu.games import register_game
from procgen_tpu.state import F32, I32, EnvState

GOAL_REWARD = 10.0
TARGET_REWARD = 3.0

GOAL = 1
OBSTACLE = 2
TARGET = 3
PLAYER_BULLET = 4
ENEMY = 5
CAVEWALL = 8
EXHAUST = 9

MARKER = 1003
PI = float(np.float32(np.pi))  # the reference's `const float PI` (cpp-utils.h:12)


class CaveFlyer(GameDef):
    name = "caveflyer"
    mixrate = 0.9
    background_group = "space_backgrounds"
    agent_only_smart = False  # drifting enemies are smart
    # enemies reflect off the *grid* only (no CAVEWALL-typed entities
    # exist), so the sequential entity-reflect sweep is not needed
    uses_entity_reflect = False
    max_smart_entities = 48  # agent + <= 45 drifting enemies
    uses_pair_collisions = True
    entity_rotations = "free"
    max_substeps = 8
    out_of_bounds_object = CAVEWALL

    def __init__(self, cfg):
        mode = cfg.distribution_mode
        if mode == DistributionMode.easy:
            self.world_dim = 30
        elif mode == DistributionMode.hard:
            self.world_dim = 40
        elif mode == DistributionMode.memory:
            self.world_dim = 60
        else:
            self.world_dim = 20  # extreme
        self.memory = mode == DistributionMode.memory
        self.world_w_max = self.world_dim
        self.world_h_max = self.world_dim
        self.visibility_val = 10.0 if mode == DistributionMode.easy else 16.0
        G = self.world_dim * self.world_dim
        self.max_objs = 3 * (G // 80)
        # agent + goal + objs + bullets(10) + exhaust(5) + explosions
        self.max_entities = 2 + self.max_objs + 24
        self.reset_max_draws = G + 1024

    def use_block_asset(self, type_):
        # caveflyer.cpp:81-83
        return type_ == CAVEWALL

    def asset_map(self, cfg):
        # caveflyer.cpp:36-54
        return {
            GOAL: ["misc_assets/ufoGreen2.png"],
            OBSTACLE: ["misc_assets/meteorBrown_big1.png"],
            TARGET: ["misc_assets/ufoRed2.png"],
            PLAYER_BULLET: ["misc_assets/laserBlue02.png"],
            ENEMY: ["misc_assets/enemyShipBlue4.png"],
            O.PLAYER: ["misc_assets/playerShip1_red.png"],
            CAVEWALL: ["misc_assets/groundA.png"],
            EXHAUST: ["misc_assets/towerDefense_tile295.png"],
            O.EXPLOSION: ["misc_assets/explosion1.png"],
            O.EXPLOSION + 1: ["misc_assets/explosion2.png"],
            O.EXPLOSION + 2: ["misc_assets/explosion3.png"],
            O.EXPLOSION + 3: ["misc_assets/explosion4.png"],
            O.EXPLOSION + 4: ["misc_assets/explosion5.png"],
        }

    def init_extra(self, cfg):
        return {}

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        d = jnp.asarray(self.world_dim, I32)
        return state.replace(main_width=d, main_height=d)

    def is_blocked(self, cfg, state, src_type, target_type, is_horizontal):
        base = GameDef.is_blocked(self, cfg, state, src_type, target_type, is_horizontal)
        return base | ((src_type == O.PLAYER) & (target_type == CAVEWALL))

    def will_reflect(self, cfg, state, src_type, target_type):
        # caveflyer.cpp:124-126
        return (src_type == ENEMY) & (
            (target_type == CAVEWALL) | (target_type == state.out_of_bounds_object)
        )

    def update_agent_velocity(self, cfg, state: EnvState) -> EnvState:
        # caveflyer.cpp:72-79: "vx += mixrate * maxspeed * action_vx * v_scale
        # * .2" -- the f32 product chain promotes to double at the .2 literal
        # and narrows once at the += store; then the 0.9 double decay
        ents = state.ents
        px = state.mixrate * state.maxspeed * state.action_vx
        py = state.mixrate * state.maxspeed * state.action_vy
        vx = fm.narrow(fm.wide(cfg, ents.vx[eo.AGENT]) + fm.wide(cfg, px) * 0.2)
        vy = fm.narrow(fm.wide(cfg, ents.vy[eo.AGENT]) + fm.wide(cfg, py) * 0.2)
        vx = dmul(cfg, vx, 0.9)
        vy = dmul(cfg, vy, 0.9)
        return state.replace(ents=eo.write_slot(ents, eo.AGENT, vx=vx, vy=vy))

    def handle_agent_collision(self, cfg, state: EnvState, mask) -> EnvState:
        # caveflyer.cpp:56-70
        t = state.ents.type
        goal = jnp.any(mask & (t == GOAL))
        dead = jnp.any(mask & ((t == OBSTACLE) | (t == ENEMY) | (t == TARGET)))
        return state.replace(
            reward=state.reward + jnp.where(goal, F32(GOAL_REWARD), 0.0),
            done=state.done | goal | dead,
            level_complete=state.level_complete | goal,
        )

    def handle_collision_pairs(self, cfg, state: EnvState, pair_mask) -> EnvState:
        """caveflyer.cpp:96-121 with src/target flipped vs. plunder: the
        *environment* entity is src and the bullet is target, so each src
        (descending) absorbs its highest-index live bullet."""
        E = state.ents.capacity
        idxs = jnp.arange(E)

        def body(k, st):
            i = E - 1 - k
            ents = st.ents
            t_i = ents.type[i]
            src_ok = (
                ents.alive[i] & ~ents.will_erase[i]
                & ((t_i == TARGET) | (t_i == OBSTACLE) | (t_i == ENEMY) | (t_i == GOAL))
            )
            valid = (
                pair_mask[i] & ~ents.will_erase & src_ok
                & (ents.type == PLAYER_BULLET)
            )
            j = jnp.max(jnp.where(valid, idxs, -1))
            hit = j >= 0
            jc = jnp.maximum(j, 0)

            is_target = hit & (t_i == TARGET)
            health = ents.health[i] - jnp.where(is_target, 1.0, 0.0)
            kill = is_target & (health <= 0)
            ents = ents.replace(health=ents.health.at[i].set(health))
            # target-kill explosion child precedes the bullet explosion
            expl1 = eo.make_entity(
                ents.x[i], ents.y[i], 0.0, 0.0, 0.5 * ents.rx[i],
                0.5 * ents.rx[i], O.EXPLOSION,
            )
            we = ents.will_erase
            we = we.at[i].set(we[i] | kill)
            we = we.at[jc].set(we[jc] | hit)
            ents = ents.replace(will_erase=we)
            ents, _ = eo.append_entity(ents, expl1, active=kill)
            reward = st.reward + jnp.where(kill, F32(TARGET_REWARD), 0.0)
            expl2 = eo.make_entity(
                ents.x[jc], ents.y[jc], ents.vx[i], ents.vy[i],
                0.5 * ents.rx[jc], 0.5 * ents.rx[jc], O.EXPLOSION,
            )
            ents, _ = eo.append_entity(ents, expl2, active=hit)
            return st.replace(ents=ents, reward=reward)

        return jax.lax.fori_loop(0, E, body, state)

    def set_action_xy(self, cfg, state, move_action):
        # caveflyer.cpp:267-289: ship-relative thrust + exhaust puff
        acc = (move_action % 3 - 1).astype(F32)
        acc = jnp.where(acc < 0, acc * F32(0.33), acc)
        ents = state.ents
        theta = -ents.rotation[eo.AGENT] + F32(PI / 2)
        thrust = acc > 0
        # "x - rx * cos(theta)": game TUs see only the C double ::cos (no
        # <math.h> C++ overloads), so the chain is double, narrowed at the
        # Entity ctor floats (caveflyer.cpp:275)
        ex = eo.make_entity(
            fm.narrow(fm.wide(cfg, ents.x[eo.AGENT])
                      - fm.wide(cfg, ents.rx[eo.AGENT]) * fm.dcos(cfg, theta)),
            fm.narrow(fm.wide(cfg, ents.y[eo.AGENT])
                      - fm.wide(cfg, ents.ry[eo.AGENT]) * fm.dsin(cfg, theta)),
            0.0, 0.0, 0.5 * ents.rx[eo.AGENT], 0.5 * ents.rx[eo.AGENT],
            EXHAUST,
        )
        ex["expire_time"] = jnp.asarray(4, I32)
        ex["rotation"] = -theta - F32(PI / 2)
        ex["grow_rate"] = F32(1.25)
        ex["alpha_decay"] = F32(0.8)
        ents, _ = eo.append_entity(ents, ex, active=thrust)
        state = state.replace(ents=ents)
        avy = fm.narrow(fm.wide(cfg, acc) * fm.dsin(cfg, theta))
        avx = fm.narrow(fm.wide(cfg, acc) * fm.dcos(cfg, theta))
        avrot = (move_action // 3 - 1).astype(F32)
        return avx, avy, avrot, state

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        dim = self.world_dim
        G = dim * dim
        Hm = Wm = dim
        dimj = jnp.asarray(dim, I32)

        # out_of_bounds_object = WALL_OBJ during levelgen (caveflyer.cpp:150)
        state = state.replace(
            out_of_bounds_object=jnp.asarray(O.WALL_OBJ, I32)
        )

        # random noise (caveflyer.cpp:152-158); flat idx = y * dim + x,
        # one bulk draw of all G cells
        rs, noise = R.rs_rand01_vec(rs, G)
        grid = jnp.where(
            noise.reshape(dim, dim) < F32(0.5), O.WALL_OBJ, O.SPACE
        ).astype(I32)
        state = state.replace(grid=grid)

        for _ in range(4):
            grid = roomgen.ca_update(grid, dimj)
        best = roomgen.best_room_mask(grid, dimj)
        # all walls, then carve the best room (caveflyer.cpp:168-180)
        inside = (jnp.arange(Wm)[None, :] < dim) & (jnp.arange(Hm)[:, None] < dim)
        grid = jnp.where(inside, jnp.where(best, O.SPACE, O.WALL_OBJ), grid)

        # free_cells in ascending flat order == mask order
        free_flat = best.reshape(-1)  # [y * dim + x] since Wm == dim
        n_free = jnp.sum(free_flat.astype(I32))
        rs, picks = ru.simple_choose_dyn(rs, n_free, 2, G, 2)
        agent_cell = ru.choose_nth_masked(free_flat, picks[0])
        goal_cell = ru.choose_nth_masked(free_flat, picks[1])

        ax = (agent_cell % dim).astype(F32) + 0.5
        ay = (agent_cell // dim).astype(F32) + 0.5
        state = state.replace(
            ents=eo.write_slot(state.ents, eo.AGENT, x=ax, y=ay)
        )
        gfields = eo.make_entity(
            (goal_cell % dim).astype(F32) + 0.5,
            (goal_cell // dim).astype(F32) + 0.5, 0.0, 0.0, 0.5, 0.5, GOAL,
        )
        gfields["collides_with_entities"] = jnp.asarray(True)
        ents, _ = eo.append_entity(state.ents, gfields, active=True)
        state = state.replace(ents=ents)

        path_flat = roomgen.find_path_mask(grid, dimj, agent_cell, goal_cell, G)
        path_mask = roomgen.flat_to_grid_mask(path_flat, dimj, Hm, Wm)

        if not self.memory:
            wide = roomgen.expand_mask(grid, dimj, path_mask, 4)
            grid = jnp.where(inside, jnp.where(wide, O.SPACE, O.WALL_OBJ), grid)

        for _ in range(4):
            grid = roomgen.ca_update(grid, dimj)
            grid = jnp.where(path_mask, O.SPACE, grid)

        grid = jnp.where(path_mask, MARKER, grid)
        # SPACE cells ascending = free cells; WALL -> CAVEWALL
        free2 = inside & (grid == O.SPACE)
        grid = jnp.where(inside & (grid == O.WALL_OBJ), CAVEWALL, grid)
        free2_flat = free2.reshape(-1)
        n_free2 = jnp.sum(free2_flat.astype(I32))
        chunk = n_free2 // 80
        num_objs = 3 * chunk
        rs, opicks = ru.simple_choose_dyn(
            rs, n_free2, num_objs, G, self.max_objs
        )
        for k in range(self.max_objs):
            on = k < num_objs
            cell = ru.choose_nth_masked(free2_flat, opicks[k])
            cx = (cell % dim).astype(F32) + 0.5
            cy = (cell // dim).astype(F32) + 0.5
            is_obst = on & (k < chunk)
            is_target = on & (k >= chunk) & (k < 2 * chunk)
            is_enemy = on & (k >= 2 * chunk)
            fields = eo.make_entity(
                cx, cy, 0.0, 0.0, 0.5, 0.5,
                jnp.where(is_obst, OBSTACLE, jnp.where(is_target, TARGET, ENEMY)),
            )
            fields["collides_with_entities"] = jnp.asarray(True)
            fields["health"] = jnp.where(is_target, F32(5.0), F32(1.0))
            # enemy velocity: rand01 then randn(2) then axis rand01
            rs, u_v = R.rs_rand01(rs, active=is_enemy)
            rs, sgn = R.rs_randn(rs, 2, active=is_enemy)
            # (.1 * rand01() + .1) * (randn(2)*2 - 1): double literals promote
            # the whole chain; one narrowing at assignment (caveflyer.cpp:245)
            if cfg.parity_mode:
                vel = (
                    (0.1 * u_v.astype(jnp.float64) + 0.1)
                    * (sgn * 2 - 1).astype(jnp.float64)
                ).astype(F32)
            else:
                vel = (F32(0.1) * u_v + F32(0.1)) * (sgn * 2 - 1).astype(F32)
            rs, u_a = R.rs_rand01(rs, active=is_enemy)
            fields["vx"] = jnp.where(is_enemy & (u_a < F32(0.5)), vel, 0.0)
            fields["vy"] = jnp.where(is_enemy & ~(u_a < F32(0.5)), vel, 0.0)
            fields["smart_step"] = is_enemy
            ents, _ = eo.append_entity(state.ents, fields, active=on)
            state = state.replace(ents=ents)

        grid = jnp.where(grid == MARKER, O.SPACE, grid)
        state = state.replace(
            grid=grid,
            out_of_bounds_object=jnp.asarray(CAVEWALL, I32),
            visibility=jnp.asarray(self.visibility_val, F32),
        )
        return state, rs

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)
        ents = state.ents

        # fire every step while held (caveflyer.cpp:293-300)
        fire = state.special_action == 1
        theta = -ents.rotation[eo.AGENT] + F32(PI / 2)
        b = eo.make_entity(
            ents.x[eo.AGENT], ents.y[eo.AGENT],
            fm.narrow(fm.dcos(cfg, theta)), fm.narrow(fm.dsin(cfg, theta)),
            0.1, 0.25, PLAYER_BULLET,
        )
        b["expire_time"] = jnp.asarray(10, I32)
        b["rotation"] = ents.rotation[eo.AGENT]
        ents, _ = eo.append_entity(ents, b, active=fire)

        # enemy facing + bullet-wall explosions (caveflyer.cpp:302-326)
        is_enemy = ents.alive & (ents.type == ENEMY)
        moving = (ents.vx != 0) | (ents.vy != 0)
        rot = jnp.where(
            is_enemy & moving,
            fm.face_rotation(cfg, ents.vx, ents.vy, -float(np.float32(PI)) / 2),
            ents.rotation,
        )
        ents = ents.replace(rotation=rot)

        is_bullet = ents.alive & (ents.type == PLAYER_BULLET)
        found_wall = jnp.zeros_like(is_bullet)
        for i in (0, 1):
            for j in (0, 1):
                px = ents.x + ents.rx * (2 * i - 1)
                py = ents.y + ents.ry * (2 * j - 1)
                t2 = jax.vmap(
                    lambda fx, fy: ph.get_obj_from_floats(state, fx, fy)
                )(px, py)
                found_wall = found_wall | (t2 == CAVEWALL)
        boom = is_bullet & found_wall & ~ents.will_erase
        ents = ents.replace(will_erase=ents.will_erase | boom)
        E = ents.capacity
        efields = {
            k: jnp.broadcast_to(v, (E,))
            for k, v in eo.make_entity(0, 0, 0, 0, 0, 0, O.EXPLOSION).items()
        }
        efields = dict(
            efields, x=ents.x, y=ents.y,
            vx=jnp.zeros((E,), F32), vy=jnp.zeros((E,), F32),
            rx=0.5 * ents.rx, ry=0.5 * ents.rx,
        )
        ents = eo.append_entities_masked(ents, efields, boom, descending=True)
        # caveflyer.cpp:323 ends its game_step with a SECOND erase_if_needed,
        # so exploded bullets vanish the same step (the base step's compact
        # already ran before this sweep)
        ents = eo.compact(ents, state.main_width, state.main_height)
        return state.replace(ents=ents)


register_game("caveflyer")(CaveFlyer)
