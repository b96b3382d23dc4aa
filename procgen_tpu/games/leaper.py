"""Leaper: Frogger-style road/river crossing (reference: games/leaper.cpp)."""

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

LOG = 1
ROAD = 2
WATER = 3
CAR = 4
FINISH_LINE = 5

MONSTER_RADIUS = F32(0.25)
LOG_RADIUS = F32(0.45)
GOAL_REWARD = 10.0
NSTEP = 5
FROG_ANIMATION_FRAMES = NSTEP
MAX_SPEED = np.float32(2 / (NSTEP - 1.0))  # 0.5
VEL_DECAY = np.float32(MAX_SPEED / NSTEP)  # 0.1

MAX_LANES = 5  # difficulty <= 4 plus one extra lane


def _sign(x):
    """leaper.cpp:23-25 (f32)."""
    return jnp.where(x > 0, F32(1.0), jnp.where(x == 0, F32(0.0), F32(-1.0)))


class LeaperGame(GameDef):
    name = "leaper"
    timeout = 500
    maxspeed = float(MAX_SPEED)
    max_jump = float(MAX_SPEED)
    max_entities = 192  # pre-roll accumulates off-screen spawns (see reset)
    entity_rotations = "axis"  # cars at 180, frog at 0/90/180/270
    sprite_tile = 64  # FINISH_LINE spans the full world width
    background_group = "topdown_backgrounds"
    reset_max_draws = 4096

    CAR_ASSETS = [
        "misc_assets/car_yellow_5.png",
        "misc_assets/car_black_1.png",
        "misc_assets/car_blue_2.png",
        "misc_assets/car_green_3.png",
        "misc_assets/car_red_4.png",
    ]
    FROG_ASSETS = [
        "misc_assets/frog1.png",
        "misc_assets/frog2.png",
        "misc_assets/frog4.png",
        "misc_assets/frog6.png",
        "misc_assets/frog7.png",
    ]

    def use_block_asset(self, type_):
        # leaper.cpp:87-89
        return type_ in (WATER, ROAD)

    def should_preserve_type_themes(self, type_):
        # leaper.cpp:91-93
        return type_ == O.PLAYER

    def asset_map(self, cfg):
        # leaper.cpp:45-67
        return {
            ROAD: ["misc_assets/roadTile6b.png"],
            WATER: ["misc_assets/terrainTile6.png"],
            CAR: list(self.CAR_ASSETS),
            LOG: ["misc_assets/elementWood044.png"],
            O.PLAYER: list(self.FROG_ASSETS),
            FINISH_LINE: ["misc_assets/finish2.png"],
        }

    def tile_ratio_for(self, img_type, rx=None, ry=None):
        # leaper.cpp:69-75: FINISH_LINE tiles horizontally with ratio 1
        return jnp.where(img_type == FINISH_LINE, F32(1.0), F32(0.0))

    def image_rect_adjust(self, img_type):
        # leaper.cpp:242-248: frog sprite drawn taller, shifted up
        is_p = img_type == O.PLAYER
        return (
            jnp.where(is_p, F32(0.0), F32(0.0)),
            jnp.where(is_p, F32(-0.275), F32(0.0)),
            jnp.where(is_p, F32(1.0), F32(1.0)),
            jnp.where(is_p, F32(1.55), F32(1.0)),
        )

    def center_agent(self, cfg):
        return False  # leaper.cpp:125

    def __init__(self, cfg):
        mode = cfg.distribution_mode
        if mode == DistributionMode.easy:
            dim = 9
            self.min_car, self.max_car = 0.03, 0.12
            self.min_log, self.max_log = 0.025, 0.075
            self.max_diff = 3
            self.easy = True
        elif mode == DistributionMode.extreme:
            dim = 20
            self.min_car, self.max_car = 0.1, 0.3
            self.min_log, self.max_log = 0.1, 0.2
            self.max_diff = 4
            self.easy = False
        else:  # hard
            dim = 15
            self.min_car, self.max_car = 0.05, 0.2
            self.min_log, self.max_log = 0.05, 0.1
            self.max_diff = 4
            self.easy = False
        self.world_dim = dim
        self.world_w_max = dim
        self.world_h_max = dim
        # leaper.cpp:177: int(main_width / min(min_car_speed, min_log_speed))
        self.preroll_steps = int(dim / min(self.min_car, self.min_log))

    def init_extra(self, cfg):
        z5 = jnp.zeros((MAX_LANES,), F32)
        return {
            "bottom_road_y": jnp.asarray(0, I32),
            "road_lane_speeds": z5,
            "n_road": jnp.asarray(0, I32),
            "bottom_water_y": jnp.asarray(0, I32),
            "water_lane_speeds": z5,
            "n_water": jnp.asarray(0, I32),
            "goal_y": jnp.asarray(0, I32),
        }

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        wd = jnp.asarray(self.world_dim, I32)
        return state.replace(main_width=wd, main_height=wd)

    def _rand_sign(self, rs, active=True):
        rs, r = R.rs_rand01(rs, active=active)
        return rs, jnp.where(r < F32(0.5), F32(1.0), F32(-1.0))

    def _choose_extra_space(self, rs):
        if self.easy:
            return rs, jnp.asarray(0, I32)
        return R.rs_randn(rs, 2)

    def _spawn_entities(self, rs, state: EnvState):
        """leaper.cpp:185-215; draws and spawns are per-lane masked."""
        ex = state.extra
        W = state.main_width.astype(F32)
        for lane in range(MAX_LANES):
            in_road = lane < ex["n_road"]
            speed = ex["road_lane_speeds"][lane]
            prob = jnp.abs(speed) / 6.0
            rs, u = R.rs_rand01(rs, active=in_road)
            spawn = in_road & (u < prob)
            x = jnp.where(speed > 0, -MONSTER_RADIUS, W + MONSTER_RADIUS)
            fields = eo.make_entity(
                x, ex["bottom_road_y"].astype(F32) + lane + 0.5,
                speed, 0.0, 2 * MONSTER_RADIUS, MONSTER_RADIUS, CAR,
            )
            rs, theme = R.rs_randn(rs, len(self.CAR_ASSETS), active=spawn)
            fields["image_theme"] = theme
            fields["rotation"] = jnp.where(
                speed < 0, F32(np.pi), F32(0.0)
            )
            no_coll = ~jnp.any(
                eo.has_any_collision_mask(
                    state.ents, fields["x"], fields["y"], fields["rx"],
                    fields["ry"],
                )
            )
            ents, _ = eo.append_entity(state.ents, fields, spawn & no_coll)
            state = state.replace(ents=ents)

        for lane in range(MAX_LANES):
            in_water = lane < ex["n_water"]
            speed = ex["water_lane_speeds"][lane]
            prob = jnp.abs(speed) / 2.0
            rs, u = R.rs_rand01(rs, active=in_water)
            spawn = in_water & (u < prob)
            x = jnp.where(speed > 0, -LOG_RADIUS, W + LOG_RADIUS)
            fields = eo.make_entity(
                x, ex["bottom_water_y"].astype(F32) + lane + 0.5,
                speed, 0.0, LOG_RADIUS, LOG_RADIUS, LOG,
            )
            no_coll = ~jnp.any(
                eo.has_any_collision_mask(
                    state.ents, fields["x"], fields["y"], fields["rx"],
                    fields["ry"],
                )
            )
            ents, _ = eo.append_entity(state.ents, fields, spawn & no_coll)
            state = state.replace(ents=ents)
        return rs, state

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        state = state.replace(
            ents=eo.write_slot(
                state.ents, eo.AGENT, y=state.ents.ry[eo.AGENT]
            )
        )

        # lanes (leaper.cpp:146-174)
        rs, extra0 = self._choose_extra_space(rs)
        bottom_road_y = extra0 + 1
        rs, difficulty = R.rs_randn(rs, self.max_diff + 1)
        if self.easy:
            extra_lane_option = jnp.asarray(0, I32)
        else:
            rs, extra_lane_option = R.rs_randn(rs, 4)

        n_road = difficulty + jnp.where(extra_lane_option == 2, 1, 0)
        road_speeds = jnp.zeros((MAX_LANES,), F32)
        for lane in range(MAX_LANES):
            act = lane < n_road
            rs, sgn = self._rand_sign(rs, active=act)
            rs, spd = R.rs_randrange(rs, self.min_car, self.max_car, active=act)
            road_speeds = road_speeds.at[lane].set(
                jnp.where(act, sgn * spd, 0.0)
            )

        rs, extra1 = self._choose_extra_space(rs)
        bottom_water_y = bottom_road_y + n_road + extra1 + 1
        n_water = difficulty + jnp.where(extra_lane_option == 3, 1, 0)
        water_speeds = jnp.zeros((MAX_LANES,), F32)
        rs, curr_sign = self._rand_sign(rs)
        for lane in range(MAX_LANES):
            act = lane < n_water
            rs, spd = R.rs_randrange(rs, self.min_log, self.max_log, active=act)
            water_speeds = water_speeds.at[lane].set(
                jnp.where(act, curr_sign * spd, 0.0)
            )
            curr_sign = jnp.where(act, -curr_sign, curr_sign)

        goal_y = bottom_water_y + n_water + 1

        # grid lane rows
        W = self.world_dim
        ys = jnp.arange(W)[:, None]
        row_is_road = (ys >= bottom_road_y) & (ys < bottom_road_y + n_road)
        row_is_water = (ys >= bottom_water_y) & (ys < bottom_water_y + n_water)
        grid = jnp.where(
            row_is_road, ROAD, jnp.where(row_is_water, WATER, O.SPACE)
        )
        grid = jnp.broadcast_to(grid, (W, W)).astype(I32)
        state = state.replace(grid=grid)

        extra = dict(state.extra)
        extra.update(
            bottom_road_y=bottom_road_y,
            road_lane_speeds=road_speeds,
            n_road=n_road,
            bottom_water_y=bottom_water_y,
            water_lane_speeds=water_speeds,
            n_water=n_water,
            goal_y=goal_y,
        )
        state = state.replace(extra=extra)

        # pre-roll (leaper.cpp:176-180): spawn + step entities repeatedly so
        # traffic reaches steady state; first erase happens on the first
        # real step, as in the reference.
        def body(_, carry):
            rs, state = carry
            rs, state = self._spawn_entities(rs, state)
            state = ph.step_entities(self, cfg, state)
            return rs, state

        rs, state = jax.lax.fori_loop(0, self.preroll_steps, body, (rs, state))

        # finish line entity (leaper.cpp:182)
        fields = eo.make_entity(
            W / 2.0, goal_y.astype(F32) - 0.5, 0.0, 0.0,
            W / 2.0, 0.5, FINISH_LINE,
        )
        ents, _ = eo.append_entity(state.ents, fields)
        return state.replace(ents=ents), rs

    def update_agent_velocity(self, cfg, state: EnvState) -> EnvState:
        # leaper.cpp:225-240: discrete hops with linear decay
        ents = state.ents
        vx = ents.vx[eo.AGENT]
        vy = ents.vy[eo.AGENT]
        theme = ents.image_theme[eo.AGENT]
        rot = ents.rotation[eo.AGENT]
        still = (vx == 0) & (vy == 0)
        avx, avy = state.action_vx, state.action_vy
        hop_x = still & (avx != 0)
        hop_y = still & ~hop_x & (avy != 0)
        vx = jnp.where(hop_x, F32(MAX_SPEED) * avx, vx)
        vy = jnp.where(hop_y, F32(MAX_SPEED) * avy, vy)
        theme = jnp.where(hop_x | hop_y, 1, theme)
        rot = jnp.where(
            hop_x,
            jnp.where(vx > 0, F32(np.pi / 2), F32(-np.pi / 2)),
            jnp.where(
                hop_y, jnp.where(vy > 0, F32(0.0), F32(np.pi)), rot
            ),
        )

        def decay(v):
            s = _sign(v)
            mag = jnp.maximum(jnp.abs(v) - VEL_DECAY, 0.0)
            return mag * s

        vx = decay(vx)
        vy = decay(vy)
        return state.replace(
            ents=eo.write_slot(
                ents, eo.AGENT, vx=vx, vy=vy, image_theme=theme, rotation=rot
            )
        )

    def handle_agent_collision(self, cfg, state: EnvState, mask) -> EnvState:
        # leaper.cpp:77-85
        ents = state.ents
        car_hit = jnp.any(mask & (ents.type == CAR))
        still = (ents.vx[eo.AGENT] == 0) & (ents.vy[eo.AGENT] == 0)
        goal_hit = jnp.any(mask & (ents.type == FINISH_LINE)) & still
        return state.replace(
            done=state.done | car_hit | goal_hit,
            reward=state.reward + jnp.where(goal_hit, F32(GOAL_REWARD), 0.0),
            level_complete=state.level_complete | goal_hit,
        )

    def game_step(self, cfg, state: EnvState) -> EnvState:
        # frog animation advances BEFORE the base step (leaper.cpp:250-253)
        ents = state.ents
        theme = ents.image_theme[eo.AGENT]
        theme = jnp.where(
            theme >= 1, (theme + 1) % FROG_ANIMATION_FRAMES, theme
        )
        state = state.replace(
            ents=eo.write_slot(ents, eo.AGENT, image_theme=theme)
        )

        state = base_game_step(self, cfg, state)
        rs, state = self._spawn_entities(state.rng, state)
        state = state.replace(rng=rs)

        # log riding (leaper.cpp:259-278): forward scan, last match wins
        ents = state.ents
        ax = ents.x[eo.AGENT]
        ay = ents.y[eo.AGENT]
        margin = -ents.rx[eo.AGENT]
        on_log = (
            ents.alive
            & (ents.type == LOG)
            & eo.entity_vs_all(
                ents, ax, ay, ents.rx[eo.AGENT], ents.ry[eo.AGENT], margin
            )
        )
        standing = jnp.any(on_log)
        last = jnp.max(jnp.where(on_log, jnp.arange(ents.capacity), -1))
        log_vx = ents.vx[jnp.maximum(last, 0)]

        in_water = (
            ph.get_obj(state, ax.astype(I32), ay.astype(I32)) == WATER
        )
        still = (ents.vx[eo.AGENT] == 0) & (ents.vy[eo.AGENT] == 0)
        drown = in_water & ~standing & still

        new_ax = jnp.where(standing, ax + log_vx, ax)
        state = state.replace(
            ents=eo.write_slot(state.ents, eo.AGENT, x=new_ax)
        )
        oob = eo.is_out_of_bounds(
            new_ax, ay, state.ents.rx[eo.AGENT], state.ents.ry[eo.AGENT],
            state.main_width, state.main_height,
        )
        return state.replace(done=state.done | drown | oob)

    def serialize_extra(self, w, s, i):
        # leaper.cpp:285-292
        w.write_int(int(s["extra.bottom_road_y"][i]))
        n_road = int(s["extra.n_road"][i])
        w.write_int(n_road)
        for k in range(n_road):
            w.write_float(s["extra.road_lane_speeds"][i][k])
        w.write_int(int(s["extra.bottom_water_y"][i]))
        n_water = int(s["extra.n_water"][i])
        w.write_int(n_water)
        for k in range(n_water):
            w.write_float(s["extra.water_lane_speeds"][i][k])
        w.write_int(int(s["extra.goal_y"][i]))

    def deserialize_extra(self, r):
        out = {}
        out["bottom_road_y"] = r.read_int()
        n_road = r.read_int()
        rs = np.zeros((MAX_LANES,), np.float32)
        for k in range(n_road):
            rs[k] = r.read_float()
        out["road_lane_speeds"] = rs
        out["n_road"] = n_road
        out["bottom_water_y"] = r.read_int()
        n_water = r.read_int()
        ws = np.zeros((MAX_LANES,), np.float32)
        for k in range(n_water):
            ws[k] = r.read_float()
        out["water_lane_speeds"] = ws
        out["n_water"] = n_water
        out["goal_y"] = r.read_int()
        return out


register_game("leaper")(LeaperGame)
