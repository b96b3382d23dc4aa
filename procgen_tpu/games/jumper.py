"""Jumper: open-world double-jump platformer with a compass toward the
carrot (reference: games/jumper.cpp)."""

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
from procgen_tpu.engine.levelgen import mazegen, roomgen
from procgen_tpu.games import register_game
from procgen_tpu.state import F32, I32, EnvState

GOAL_REWARD = 10.0

GOAL = 1
SPIKE = 2
CAVEWALL = 6
CAVEWALL_TOP = 7
PLAYER_JUMP = 9
PLAYER_LEFT1 = 10
PLAYER_LEFT2 = 11
PLAYER_RIGHT1 = 12
PLAYER_RIGHT2 = 13

MAZE_SCALE = 3
JUMP_COOLDOWN = 3
NUM_WALL_THEMES = 4

CLOCK_COLOR = (168.0, 166.0, 158.0)  # jumper.cpp:139
HIGHLIGHT_COLOR = (252.0, 186.0, 3.0)

GOAL_SLOT = 1  # goal spawns right after the agent and is never erased


def _is_wall(t):
    return (t == CAVEWALL) | (t == CAVEWALL_TOP)


class Jumper(GameDef):
    name = "jumper"
    background_group = "platform_backgrounds"
    out_of_bounds_object = CAVEWALL
    max_substeps = 8
    entity_rotations = "none"
    grid_theme_count = NUM_WALL_THEMES

    def __init__(self, cfg):
        mode = cfg.distribution_mode
        if mode == DistributionMode.hard:
            self.world_dim = 40
        elif mode == DistributionMode.memory:
            self.world_dim = 45
        else:
            self.world_dim = 20
        self.memory = mode == DistributionMode.memory
        self.easy = mode == DistributionMode.easy
        if self.memory:
            self.timeout = 2000
        self.world_w_max = self.world_dim
        self.world_h_max = self.world_dim
        self.visibility_val = 12.0 if self.easy else 16.0
        self.compass_dim = 3.0 if self.easy else 2.0
        self.spike_prob = 0.0 if self.memory else 0.2
        G = self.world_dim * self.world_dim
        # agent + goal + spikes (generous tail bound) + ~9 live trails
        self.max_entities = 2 + (16 if self.easy else 96) + 12
        self.reset_max_draws = G + 1024

    def use_block_asset(self, type_):
        # jumper.cpp:107-109
        return type_ in (CAVEWALL, CAVEWALL_TOP)

    def asset_map(self, cfg):
        # jumper.cpp:50-79
        return {
            O.PLAYER: ["misc_assets/bunny2_ready.png"],
            SPIKE: ["misc_assets/spikeMan_stand.png"],
            GOAL: ["misc_assets/carrot.png"],
            PLAYER_JUMP: ["misc_assets/bunny2_jump.png"],
            PLAYER_RIGHT1: ["misc_assets/bunny2_walk1.png"],
            PLAYER_RIGHT2: ["misc_assets/bunny2_walk2.png"],
            PLAYER_LEFT1: ["misc_assets/bunny2_walk1.png"],
            PLAYER_LEFT2: ["misc_assets/bunny2_walk2.png"],
            CAVEWALL_TOP: [
                "platformer/tileBlue_05.png", "platformer/tileGreen_05.png",
                "platformer/tileYellow_06.png", "platformer/tileBrown_06.png",
            ],
            CAVEWALL: [
                "platformer/tileBlue_08.png", "platformer/tileGreen_08.png",
                "platformer/tileYellow_09.png", "platformer/tileBrown_09.png",
            ],
            O.TRAIL: ["misc_assets/iconCircle_white.png"],
        }

    def grid_themed_types(self):
        return (CAVEWALL, CAVEWALL_TOP)

    def grid_theme_state(self, cfg, state):
        return state.extra["wall_theme"]

    def init_extra(self, cfg):
        z = jnp.asarray(0, I32)
        return {
            "jump_count": z,
            "jump_delta": z,
            "jump_time": z,
            "has_support": jnp.asarray(False),
            "facing_right": jnp.asarray(True),
            "wall_theme": z,
        }

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        d = jnp.asarray(self.world_dim, I32)
        return state.replace(main_width=d, main_height=d)

    def is_blocked(self, cfg, state, src_type, target_type, is_horizontal):
        base = GameDef.is_blocked(self, cfg, state, src_type, target_type, is_horizontal)
        return base | ((src_type == O.PLAYER) & _is_wall(target_type))

    def update_agent_velocity(self, cfg, state: EnvState) -> EnvState:
        # jumper.cpp:94-100; gravity applies in game_step
        ents = state.ents
        vx = (1 - state.mixrate) * ents.vx[eo.AGENT]
        vx = vx + state.mixrate * state.maxspeed * state.action_vx
        vy = jnp.where(
            state.action_vy != 0,
            state.maxspeed * state.action_vy * 2,
            ents.vy[eo.AGENT],
        )
        return state.replace(ents=eo.write_slot(ents, eo.AGENT, vx=vx, vy=vy))

    def entity_image_override(self, cfg, state):
        # image_for_type (jumper.cpp:122-137)
        ents = state.ents
        ex = state.extra
        has_support = ex["has_support"]
        vx = ents.vx[eo.AGENT]
        standing = (jnp.abs(vx) < 0.01) & (state.action_vx == 0) & has_support
        walk1 = (state.cur_time // 5 % 2 == 0) | ~has_support
        right = ex["facing_right"]
        img = jnp.where(
            standing,
            O.PLAYER,
            jnp.where(
                right,
                jnp.where(walk1, PLAYER_RIGHT1, PLAYER_RIGHT2),
                jnp.where(walk1, PLAYER_LEFT1, PLAYER_LEFT2),
            ),
        )
        return jnp.where(
            jnp.arange(ents.capacity) == eo.AGENT, img, ents.image_type
        )

    def handle_agent_collision(self, cfg, state: EnvState, mask) -> EnvState:
        # jumper.cpp:81-91
        t = state.ents.type
        goal = jnp.any(mask & (t == GOAL))
        dead = jnp.any(mask & (t == SPIKE))
        return state.replace(
            reward=state.reward + jnp.where(goal, F32(GOAL_REWARD), 0.0),
            done=state.done | goal | dead,
            level_complete=state.level_complete | goal,
        )

    def hud_overlay(self, cfg, state, out, SX, SY):
        """Compass + distance bar + landing shadow (jumper.cpp:137-177);
        Qt's antialiased ellipse/line coverage is approximated by signed
        distance, which matches within a pixel."""
        if self.memory:
            return out
        ents = state.ents
        unit = state.unit
        cdim = F32(self.compass_dim)
        x0 = (state.view_dim - cdim - 0.25) * unit
        y0 = F32(0.25) * unit
        w = cdim * unit
        cx = x0 + w / 2
        cy = y0 + w / 2
        r = w / 2
        d2 = (SX - cx) ** 2 + (SY - cy) ** 2
        inside_disc = d2 <= r * r
        out = jnp.where(
            inside_disc[..., None], jnp.asarray(CLOCK_COLOR, F32), out
        )

        theta = jnp.arctan2(
            ents.y[GOAL_SLOT] - ents.y[eo.AGENT],
            ents.x[GOAL_SLOT] - ents.x[eo.AGENT],
        )
        cr = r * 0.95
        ex_ = cx + cr * jnp.cos(theta)
        ey_ = cy - cr * jnp.sin(theta)
        # distance from pixel center to the needle segment
        dx, dy = ex_ - cx, ey_ - cy
        L2 = jnp.maximum(dx * dx + dy * dy, 1e-6)
        t_ = jnp.clip(((SX - cx) * dx + (SY - cy) * dy) / L2, 0.0, 1.0)
        px = cx + t_ * dx
        py = cy + t_ * dy
        seg_d2 = (SX - px) ** 2 + (SY - py) ** 2
        pen = F32(64.0) / (256.0 / cdim) / 2  # rect.width()/(256/cdim) / 2
        on_line = seg_d2 <= pen * pen
        out = jnp.where(
            on_line[..., None], jnp.asarray(HIGHLIGHT_COLOR, F32), out
        )

        dist = jnp.sqrt(
            (ents.x[eo.AGENT] - ents.x[GOAL_SLOT]) ** 2
            + (ents.y[eo.AGENT] - ents.y[GOAL_SLOT]) ** 2
        )
        dist_pct = dist / (state.main_width.astype(F32) * F32(np.sqrt(2)))
        bar_h = cdim / 8 * unit
        bx0 = x0
        by0 = (0.25 + cdim) * unit + y0 - F32(0.25) * unit
        bw = cdim * dist_pct * unit
        in_bar = (SX >= bx0) & (SX < bx0 + bw) & (SY >= by0) & (SY < by0 + bar_h)
        out = jnp.where(
            in_bar[..., None], jnp.asarray(HIGHLIGHT_COLOR, F32), out
        )

        # landing shadow while mid-air after a jump (jumper.cpp:166-171)
        show = (state.extra["jump_delta"] < 0) & ~state.extra["has_support"]
        ax = ents.x[eo.AGENT]
        ay = ents.y[eo.AGENT]
        arx, ary = ents.rx[eo.AGENT], ents.ry[eo.AGENT]
        rx0 = (ax - arx) * unit - state.x_off
        ry0 = (state.view_dim - (ay + ary)) * unit + state.y_off
        rw = 2 * arx * unit
        rh = 2 * ary * unit
        ecx = rx0 + rw / 2
        ecy = ry0 + rh * F32(5.0 / 6) + rh / 6
        era = rw / 2
        erb = rh / 6
        ell = ((SX - ecx) / jnp.maximum(era, 1e-6)) ** 2 + (
            (SY - ecy) / jnp.maximum(erb, 1e-6)
        ) ** 2 <= 1
        a = F32(120.0 / 255.0)
        white = jnp.asarray((255.0, 255.0, 255.0), F32)
        blended = white * a + out * (1 - a)
        return jnp.where((ell & show)[..., None], blended, out)

    def set_action_xy(self, cfg, state, move_action):
        # jumper.cpp:389-423: double jump with cooldown
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
        has_support = _is_wall(b1) | _is_wall(b2)  # OOB object is CAVEWALL
        extra["jump_delta"] = jnp.asarray(0, I32)
        extra["has_support"] = has_support
        jc = jnp.where(has_support, 2, extra["jump_count"])
        can_jump = (
            (avy == 1) & (jc > 0)
            & (state.cur_time - extra["jump_time"] > JUMP_COOLDOWN)
        )
        jc = jc - can_jump.astype(I32)
        extra["jump_count"] = jc
        extra["jump_delta"] = jnp.where(can_jump, -1, extra["jump_delta"])
        avy = jnp.where(can_jump, avy, 0.0)
        extra["jump_time"] = jnp.where(
            avy > 0, state.cur_time, extra["jump_time"]
        )
        return avx, avy, F32(0.0), state.replace(extra=extra)

    def game_reset(self, cfg, state: EnvState, rs):
        state = state.replace(
            visibility=jnp.asarray(self.visibility_val, F32),
        )
        state, rs = base_game_reset(self, cfg, state, rs)
        dim = self.world_dim
        G = dim * dim
        dimj = jnp.asarray(dim, I32)
        inside = (
            (jnp.arange(dim)[None, :] < dim) & (jnp.arange(dim)[:, None] < dim)
        )

        # out_of_bounds_object = WALL_OBJ during levelgen (jumper.cpp:251)
        state = state.replace(out_of_bounds_object=jnp.asarray(O.WALL_OBJ, I32))

        rs, wall_theme = R.rs_randn(rs, NUM_WALL_THEMES)

        # coarse maze bias + noise (jumper.cpp:245-259)
        maze_dim = dim // MAZE_SCALE
        rs, mgrid = mazegen.generate_maze_no_dead_ends(rs, maze_dim, maze_dim)
        ys = jnp.arange(dim)[:, None] // MAZE_SCALE + 1
        xs = jnp.arange(dim)[None, :] // MAZE_SCALE + 1
        coarse_wall = mgrid[ys, xs] == O.WALL_OBJ
        rs, noise = R.rs_rand01_vec(rs, G)
        prob = jnp.where(coarse_wall, F32(0.8), F32(0.2))
        grid = jnp.where(
            noise.reshape(dim, dim) < prob, O.WALL_OBJ, O.SPACE
        ).astype(I32)

        for _ in range(2):
            grid = roomgen.ca_update(grid, dimj)

        # borders (as CAVEWALL, which counts as neither WALL nor SPACE for
        # the component search) (jumper.cpp:264-274)
        grid = grid.at[0, :dim].set(CAVEWALL)
        grid = grid.at[dim - 1, :dim].set(CAVEWALL)
        grid = grid.at[:dim, 0].set(CAVEWALL)
        grid = grid.at[:dim, dim - 1].set(CAVEWALL)

        best = roomgen.best_room_mask(grid, dimj)
        grid = jnp.where(inside, jnp.where(best, O.SPACE, CAVEWALL), grid)

        free_flat = best.reshape(-1)
        n_free = jnp.sum(free_flat.astype(I32))
        rs, gpick = R.rs_randn(rs, jnp.maximum(n_free, 1))
        goal_cell = ru_choose_nth(free_flat, gpick)

        # agent candidates: SPACE with SPACE above and CAVEWALL/OOB below
        ground = _space_on_ground_mask(grid, dim)
        gflat = ground.reshape(-1)
        n_ground = jnp.sum(gflat.astype(I32))
        rs, apick = R.rs_randn(rs, jnp.maximum(n_ground, 1))
        agent_cell = ru_choose_nth(gflat, apick)

        path_flat = roomgen.find_path_mask(grid, dimj, agent_cell, goal_cell, G)
        path_mask = roomgen.flat_to_grid_mask(path_flat, dimj, dim, dim)

        if not self.memory:
            # prune: widen the path and wall everything else.  The walls
            # written here are CAVEWALL in the reference
            wide = roomgen.expand_mask(grid, dimj, path_mask, 4)
            grid = jnp.where(inside, jnp.where(wide, O.SPACE, CAVEWALL), grid)

        gfields = eo.make_entity(
            (goal_cell % dim).astype(F32) + 0.5,
            (goal_cell // dim).astype(F32) + 0.5, 0.0, 0.0, 0.5, 0.5, GOAL,
        )
        ents, _ = eo.append_entity(state.ents, gfields, active=True)
        state = state.replace(ents=ents)

        # spike placement: sequential ascending scan with masked draws;
        # placing a spike disqualifies its right neighbor (jumper.cpp:326-337)
        def spike_body(i, carry):
            rs, grid = carry
            x = i % dim
            y = i // dim
            ok = (
                _sog(grid, dim, x, y)
                & _sog(grid, dim, x - 1, y)
                & _sog(grid, dim, x + 1, y)
            )
            rs, u = R.rs_rand01(rs, active=ok)
            place = ok & (u < F32(self.spike_prob))
            grid = grid.at[y, x].set(jnp.where(place, SPIKE, grid[y, x]))
            return rs, grid

        rs, grid = jax.lax.fori_loop(0, G, spike_body, (rs, grid))

        # long-vertical-wall fix (jumper.cpp:340-351)
        def wall_fix_body(i, carry):
            rs, grid = carry
            x = i % dim
            y = i // dim
            lw = (
                _is_lw(grid, dim, x, y)
                & _is_lw(grid, dim, x, y + 1)
                & _is_lw(grid, dim, x, y + 2)
            )
            rs, o1 = R.rs_randn(rs, 3, active=lw)
            yy = jnp.clip(y + o1, 0, dim - 1)
            grid = grid.at[yy, x].set(jnp.where(lw, O.SPACE, grid[yy, x]))
            rw = (
                _is_rw(grid, dim, x, y)
                & _is_rw(grid, dim, x, y + 1)
                & _is_rw(grid, dim, x, y + 2)
            )
            rs, o2 = R.rs_randn(rs, 3, active=rw)
            yy2 = jnp.clip(y + o2, 0, dim - 1)
            grid = grid.at[yy2, x].set(jnp.where(rw, O.SPACE, grid[yy2, x]))
            return rs, grid

        rs, grid = jax.lax.fori_loop(0, G, wall_fix_body, (rs, grid))

        state = state.replace(
            ents=eo.write_slot(
                state.ents, eo.AGENT,
                x=(agent_cell % dim).astype(F32) + 0.5,
                y=(agent_cell // dim).astype(F32) + state.ents.ry[eo.AGENT],
            )
        )

        # spike cells -> entities (ascending get_cells_with_type order)
        def spike_ent_body(i, st_grid):
            st, grid = st_grid
            x = i % dim
            y = i // dim
            is_spike = grid[y, x] == SPIKE
            grid = grid.at[y, x].set(jnp.where(is_spike, O.SPACE, grid[y, x]))
            fields = eo.make_entity(
                x.astype(F32) + 0.5, y.astype(F32) + 0.4, 0.0, 0.0,
                0.23, 0.4, SPIKE,
            )
            ents, _ = eo.append_entity(st.ents, fields, active=is_spike)
            return st.replace(ents=ents), grid

        state, grid = jax.lax.fori_loop(
            0, G, spike_ent_body, (state, grid)
        )

        # top-wall caps (jumper.cpp:367-374)
        above = jnp.roll(grid, -1, axis=0)
        above = above.at[dim - 1, :].set(O.WALL_OBJ)  # OOB above is not SPACE
        top = (grid == CAVEWALL) & (above == O.SPACE)
        grid = jnp.where(top, CAVEWALL_TOP, grid)

        state = state.replace(
            ents=eo.write_slot(
                state.ents, eo.AGENT, rx=F32(0.254), ry=F32(0.4)
            ),
            grid=grid,
            out_of_bounds_object=jnp.asarray(CAVEWALL, I32),
        )

        extra = dict(state.extra)
        extra["wall_theme"] = wall_theme
        extra["jump_count"] = jnp.asarray(0, I32)
        extra["jump_delta"] = jnp.asarray(0, I32)
        extra["jump_time"] = jnp.asarray(0, I32)
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

        # motion trail (jumper.cpp:436-441)
        moving = (
            jnp.abs(ents.vx[eo.AGENT]) + jnp.abs(ents.vy[eo.AGENT]) > 0.05
        )
        trail = eo.make_entity(
            ents.x[eo.AGENT], ents.y[eo.AGENT] - ents.ry[eo.AGENT] * 0.5,
            0.0, F32(0.01), 0.3, 0.2, O.TRAIL,
        )
        trail["expire_time"] = jnp.asarray(8, I32)
        trail["alpha"] = F32(0.5)
        ents, _ = eo.append_entity(ents, trail, active=moving)

        # gravity (jumper.cpp:443-445)
        vy = ents.vy[eo.AGENT]
        vy = jnp.where(vy > -2, vy - F32(0.15), vy)
        ents = eo.write_slot(ents, eo.AGENT, vy=vy)
        return state.replace(ents=ents)

    def serialize_extra(self, w, s, i):
        # jumper.cpp:448-463
        w.write_int(int(s["extra.jump_count"][i]))
        w.write_int(int(s["extra.jump_delta"][i]))
        w.write_int(int(s["extra.jump_time"][i]))
        w.write_bool(bool(s["extra.has_support"][i]))
        w.write_bool(bool(s["extra.facing_right"][i]))
        w.write_int(int(s["extra.wall_theme"][i]))
        w.write_float(self.compass_dim)

    def deserialize_extra(self, r):
        out = {}
        out["jump_count"] = r.read_int()
        out["jump_delta"] = r.read_int()
        out["jump_time"] = r.read_int()
        out["has_support"] = r.read_bool()
        out["facing_right"] = r.read_bool()
        out["wall_theme"] = r.read_int()
        r.read_float()
        return out


def ru_choose_nth(mask, n):
    from procgen_tpu.engine.rand_util import choose_nth_masked

    return choose_nth_masked(mask, n)


def _grid_at(grid, dim, x, y, oob):
    ok = (x >= 0) & (x < dim) & (y >= 0) & (y < dim)
    v = grid[jnp.clip(y, 0, grid.shape[0] - 1), jnp.clip(x, 0, grid.shape[1] - 1)]
    return jnp.where(ok, v, oob)


def _sog(grid, dim, x, y):
    """is_space_on_ground (jumper.cpp:180-187); OOB object is WALL during
    levelgen, which can_support... the below check accepts CAVEWALL or the
    oob object (WALL_OBJ at this stage)."""
    oob = O.WALL_OBJ
    c = _grid_at(grid, dim, x, y, oob) == O.SPACE
    up = _grid_at(grid, dim, x, y + 1, oob) == O.SPACE
    below = _grid_at(grid, dim, x, y - 1, oob)
    return c & up & ((below == CAVEWALL) | (below == oob))


def _space_on_ground_mask(grid, dim):
    """Vectorized is_space_on_ground over the whole grid (pre-prune scan for
    agent candidates, jumper.cpp:294-302)."""
    oob = O.WALL_OBJ
    Hm, Wm = grid.shape
    up = jnp.roll(grid, -1, axis=0).at[Hm - 1, :].set(oob)
    down = jnp.roll(grid, 1, axis=0).at[0, :].set(oob)
    inside = (
        (jnp.arange(Wm)[None, :] < dim) & (jnp.arange(Hm)[:, None] < dim)
    )
    return (
        inside
        & (grid == O.SPACE)
        & (up == O.SPACE)
        & ((down == CAVEWALL) | (down == oob))
    )


def _is_lw(grid, dim, x, y):
    oob = O.WALL_OBJ
    return (_grid_at(grid, dim, x, y, oob) == CAVEWALL) & (
        _grid_at(grid, dim, x + 1, y, oob) == O.SPACE
    )


def _is_rw(grid, dim, x, y):
    oob = O.WALL_OBJ
    return (_grid_at(grid, dim, x, y, oob) == CAVEWALL) & (
        _grid_at(grid, dim, x - 1, y, oob) == O.SPACE
    )


register_game("jumper")(Jumper)
