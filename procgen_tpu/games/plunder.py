"""Plunder: shoot enemy-colored ships, spare friendlies (reference:
games/plunder.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import objects as O
from procgen_tpu import fmath as fm
from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode
from procgen_tpu.engine import entity_ops as eo
from procgen_tpu.engine import rand_util as ru
from procgen_tpu.engine.base import GameDef, base_game_reset, base_game_step
from procgen_tpu.games import register_game
from procgen_tpu.render import assets
from procgen_tpu.state import F32, I32, EnvState

COMPLETION_BONUS = 10.0
POSITIVE_REWARD = 1.0

PLAYER_BULLET = 1
TARGET_LEGEND = 2
TARGET_BACKGROUND = 3
PANEL = 6
SHIP = 7

NUM_LANES = 5
NUM_SHIP_TYPES = 6
NUM_CURRENT = 2  # num_current_ship_types
TARGET_QUOTA = 20
SPAWN_PROB = 0.06
LEGEND_R = 2.0
KEY_SCALE = 1.5

JUICE_COLOR = (66.0, 245.0, 135.0)  # plunder.cpp:69
PROGRESS_COLOR = (245.0, 66.0, 144.0)

SHIP_ASSETS = tuple(f"misc_assets/ship_{i}.png" for i in range(1, 7))


class Plunder(GameDef):
    name = "plunder"
    timeout = 4000  # plunder.cpp:35
    world_w_max = 20
    world_h_max = 20
    mixrate = 0.5
    maxspeed = 0.85
    has_useful_vel_info = False
    background_group = "water_surface_backgrounds"
    uses_pair_collisions = True
    max_substeps = 8
    entity_rotations = "axis"  # agent -pi/2, legend pi/2, ships 0
    max_entities = 96

    def __init__(self, cfg):
        self.r_scale = (
            1.5 if cfg.distribution_mode == DistributionMode.easy else 1.0
        )
        self.easy = cfg.distribution_mode == DistributionMode.easy
        self.ship_aspects = np.asarray(
            [assets.aspect_ratio(n) for n in SHIP_ASSETS], F32
        )
        self.min_agent_x_of = lambda arx: 2 * LEGEND_R + arx

    def should_preserve_type_themes(self, type_):
        # plunder.cpp:83-85
        return type_ == SHIP

    def asset_map(self, cfg):
        # plunder.cpp:49-64 + reserved explosion frames (bag.cpp:416-427)
        return {
            SHIP: list(SHIP_ASSETS),
            PLAYER_BULLET: ["misc_assets/cannonBall.png"],
            PANEL: ["misc_assets/panel_wood.png"],
            TARGET_BACKGROUND: ["misc_assets/target_red2.png"],
            O.EXPLOSION: ["misc_assets/explosion1.png"],
            O.EXPLOSION + 1: ["misc_assets/explosion2.png"],
            O.EXPLOSION + 2: ["misc_assets/explosion3.png"],
            O.EXPLOSION + 3: ["misc_assets/explosion4.png"],
            O.EXPLOSION + 4: ["misc_assets/explosion5.png"],
        }

    def center_agent(self, cfg):
        return False  # plunder.cpp:177

    def init_extra(self, cfg):
        return {
            "last_fire_time": jnp.asarray(0, I32),
            "lane_directions": jnp.zeros((NUM_LANES,), jnp.bool_),
            "lane_vels": jnp.zeros((NUM_LANES,), F32),
            "target_bools": jnp.zeros((NUM_SHIP_TYPES,), jnp.bool_),
            "image_permutation": jnp.zeros((NUM_SHIP_TYPES,), I32),
            "targets_hit": jnp.asarray(0, I32),
            "juice_left": jnp.asarray(0.0, F32),
        }

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        return state.replace(
            main_width=jnp.asarray(20, I32), main_height=jnp.asarray(20, I32)
        )

    def set_action_xy(self, cfg, state, move_action):
        # plunder.cpp:110-114: horizontal only
        return (move_action // 3 - 1).astype(F32), F32(0.0), F32(0.0)

    def hud_color_rects(self, cfg, state):
        # plunder.cpp:66-77: juice + progress bars
        mw = state.main_width.astype(F32)
        juice = state.extra["juice_left"]
        prog = state.extra["targets_hit"].astype(F32) / TARGET_QUOTA
        rects = jnp.stack(
            [
                jnp.stack([F32(0.25), F32(0.25), mw * juice, F32(0.5)]),
                jnp.stack([F32(0.25), F32(0.75), mw * prog, F32(0.5)]),
            ]
        )
        colors = jnp.asarray([JUICE_COLOR, PROGRESS_COLOR], F32)
        return rects, colors

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        mw, mh = F32(20.0), F32(20.0)
        r_scale = F32(self.r_scale)

        # image permutation: choose_n over [0..5] (plunder.cpp:135-143)
        rs, perm, _ = ru.choose_n_erase(
            rs, jnp.ones((NUM_SHIP_TYPES,), jnp.bool_), NUM_SHIP_TYPES,
            NUM_SHIP_TYPES,
        )
        target_bools = jnp.zeros((NUM_SHIP_TYPES,), jnp.bool_)
        target_bools = target_bools.at[perm[0]].set(True)  # num_current/2 == 1

        lane_dirs = jnp.zeros((NUM_LANES,), jnp.bool_)
        lane_vels = jnp.zeros((NUM_LANES,), F32)
        for i in range(NUM_LANES):
            rs, u_d = R.rs_rand01(rs)
            lane_dirs = lane_dirs.at[i].set(u_d < F32(0.5))
            rs, u_v = R.rs_rand01(rs)
            # .15 + .1 * rand01(): double literals promote, one narrowing on
            # the vector<float> push_back (plunder.cpp:153)
            lane_vels = lane_vels.at[i].set(
                fm.narrow(0.15 + 0.1 * fm.wide(cfg, u_v))
            )

        # panels (hard only; the easy ternary skips the randn, plunder.cpp:156)
        if not self.easy:
            rs, num_panels = R.rs_randn(rs, 4)
            for i in range(3):
                rs, state, _ = eo.spawn_entity_rxy(
                    rs, state, 1.2, 0.5, PANEL, 0.0, 0.25 * 20, mw, 0.25 * 20,
                    active=i < num_panels,
                )

        # target legend (plunder.cpp:161-170)
        state, _ = eo.add_entity_rxy(
            state, LEGEND_R, LEGEND_R, 0.0, 0.0, LEGEND_R, LEGEND_R,
            TARGET_BACKGROUND,
        )
        leg_rx = r_scale * KEY_SCALE
        leg_ry = fm.fdiv(cfg, leg_rx, jnp.asarray(self.ship_aspects)[perm[0]])  # match_aspect_ratio
        fields = eo.make_entity(
            LEGEND_R, LEGEND_R, 0.0, 0.0, leg_rx, leg_ry, TARGET_LEGEND
        )
        fields["image_type"] = jnp.asarray(SHIP, I32)
        fields["image_theme"] = perm[0]
        fields["rotation"] = F32(np.pi / 2)
        ents, _ = eo.append_entity(state.ents, fields, active=True)
        state = state.replace(ents=ents)

        # agent setup + reposition (plunder.cpp:172-189)
        rs, th_idx = R.rs_randn(rs, NUM_CURRENT // 2)  # randn(1), still drawn
        agent_theme = perm[th_idx + NUM_CURRENT // 2]
        arx = r_scale
        ary = fm.fdiv(cfg, arx, jnp.asarray(self.ship_aspects)[agent_theme])
        ents = eo.write_slot(
            state.ents, eo.AGENT, rx=arx, ry=ary, rotation=F32(-np.pi / 2),
            image_type=jnp.asarray(SHIP, I32), image_theme=agent_theme,
        )
        state = state.replace(ents=ents)

        # reposition_agent (bag.cpp:531-539): do-while rejection vs entities
        def try_pos(rs, active):
            rs, ux = R.rs_rand01(rs, active=active)
            rs, uy = R.rs_rand01(rs, active=active)
            return rs, ux * (mw - 2 * arx) + arx, uy * (mh - 2 * ary) + ary

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

        ay = 1 + ary  # agent->y = 1 + agent->ry
        min_agent_x = 2 * LEGEND_R + arx
        ax = jnp.maximum(ax, min_agent_x)
        state = state.replace(
            ents=eo.write_slot(state.ents, eo.AGENT, x=ax, y=ay)
        )

        extra = dict(state.extra)
        extra["last_fire_time"] = jnp.asarray(0, I32)
        extra["lane_directions"] = lane_dirs
        extra["lane_vels"] = lane_vels
        extra["target_bools"] = target_bools
        extra["image_permutation"] = perm
        extra["targets_hit"] = jnp.asarray(0, I32)
        extra["juice_left"] = jnp.asarray(1.0, F32)
        return state.replace(extra=extra), rs

    def handle_collision_pairs(self, cfg, state: EnvState, pair_mask) -> EnvState:
        """Sequential reverse sweep (bag.cpp:719-741 + plunder.cpp:88-107):
        a bullet hits only the highest-index live SHIP/PANEL (after which it
        is will_erase and skips the rest); kills chain across bullets."""
        E = state.ents.capacity
        idxs = jnp.arange(E)

        def body(k, carry):
            state = carry
            i = E - 1 - k
            ents = state.ents
            is_bullet = ents.type[i] == PLAYER_BULLET
            # re-apply current will_erase: pair_mask was built pre-sweep
            valid = (
                pair_mask[i]
                & ~ents.will_erase
                & ~ents.will_erase[i]
                & is_bullet
            )
            actionable = valid & ((ents.type == SHIP) | (ents.type == PANEL))
            j = jnp.max(jnp.where(actionable, idxs, -1))
            hit = j >= 0
            jc = jnp.maximum(j, 0)
            t = ents.type[jc]
            hit_ship = hit & (t == SHIP)
            hit_panel = hit & (t == PANEL)

            is_tgt = state.extra["target_bools"][ents.image_theme[jc]]
            reward = state.reward + jnp.where(
                hit_ship & is_tgt, F32(POSITIVE_REWARD), F32(0.0)
            )
            juice = state.extra["juice_left"] + jnp.where(
                hit_ship, jnp.where(is_tgt, F32(0.1), F32(-0.1)), F32(0.0)
            )
            targets_hit = state.extra["targets_hit"] + (
                hit_ship & is_tgt
            ).astype(I32)

            we = ents.will_erase
            we = we.at[i].set(we[i] | hit_ship | hit_panel)
            we = we.at[jc].set(we[jc] | hit_ship)
            ents = ents.replace(will_erase=we)

            # explosion on the killed ship (plunder.cpp:104-106)
            fields = eo.make_entity(
                ents.x[jc], ents.y[jc], ents.vx[jc] / 2, ents.vy[jc] / 2,
                0.5 * ents.rx[jc], 0.5 * ents.rx[jc], O.EXPLOSION,
            )
            ents, _ = eo.append_entity(ents, fields, active=hit_ship)

            extra = dict(state.extra)
            extra["juice_left"] = juice
            extra["targets_hit"] = targets_hit
            return state.replace(ents=ents, extra=extra, reward=reward)

        return jax.lax.fori_loop(0, E, body, state)

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)
        extra = dict(state.extra)
        mw, mh = F32(20.0), F32(20.0)
        r_scale = F32(self.r_scale)

        juice = extra["juice_left"] - F32(0.0015)

        # ship spawner (plunder.cpp:195-214)
        mt, u = R.mt_rand01(state.rng)
        spawn = u < F32(SPAWN_PROB)
        mt, lane = R.mt_randn(mt, NUM_LANES, active=spawn)
        ent_y = (lane.astype(F32) * F32(0.11) + F32(0.4)) * (
            mh / 2 - r_scale
        ) + mh / 2
        moves_right = extra["lane_directions"][lane]
        ent_vx = extra["lane_vels"][lane] * jnp.where(moves_right, 1.0, -1.0)
        mt, ti = R.mt_randn(mt, NUM_CURRENT, active=spawn)
        theme = extra["image_permutation"][ti]
        ent_x = jnp.where(moves_right, -r_scale, mw + r_scale)
        fields = eo.make_entity(
            ent_x, ent_y, ent_vx, 0.0, r_scale,
            fm.fdiv(cfg, r_scale, jnp.asarray(self.ship_aspects)[theme]), SHIP,
        )
        fields["image_type"] = jnp.asarray(SHIP, I32)
        fields["image_theme"] = theme
        fields["is_reflected"] = ~moves_right
        no_coll = ~jnp.any(
            eo.has_any_collision_mask(
                state.ents, fields["x"], fields["y"], fields["rx"], fields["ry"]
            )
        )
        ents, _ = eo.append_entity(state.ents, fields, active=spawn & no_coll)
        state = state.replace(rng=mt, ents=ents)

        # fire cannonball (plunder.cpp:216-222)
        fire = (state.special_action == 1) & (
            state.cur_time - extra["last_fire_time"] >= 3
        )
        bullet = eo.make_entity(
            state.ents.x[eo.AGENT], state.ents.y[eo.AGENT], 0.0, 1.0, 0.25,
            0.25, PLAYER_BULLET,
        )
        bullet["collides_with_entities"] = jnp.asarray(True)
        bullet["expire_time"] = jnp.asarray(50, I32)
        ents, _ = eo.append_entity(state.ents, bullet, active=fire)
        extra["last_fire_time"] = jnp.where(
            fire, state.cur_time, extra["last_fire_time"]
        )
        juice = juice - jnp.where(fire, F32(0.02), F32(0.0))

        done = state.done | (juice <= 0)
        juice = jnp.minimum(juice, 1.0)

        quota = extra["targets_hit"] >= TARGET_QUOTA
        reward = state.reward + jnp.where(quota, F32(COMPLETION_BONUS), F32(0.0))
        done = done | quota

        # keep clear of the legend (plunder.cpp:237-239)
        min_agent_x = 2 * LEGEND_R + ents.rx[eo.AGENT]
        ax = jnp.maximum(ents.x[eo.AGENT], min_agent_x)
        ents = eo.write_slot(ents, eo.AGENT, x=ax)

        extra["juice_left"] = juice
        return state.replace(
            ents=ents, extra=extra, reward=reward, done=done,
            level_complete=state.level_complete | quota,
        )

    def serialize_extra(self, w, s, i):
        # plunder.cpp:242-258
        w.write_int(int(s["extra.last_fire_time"][i]))
        w.write_vector_bool([bool(b) for b in s["extra.lane_directions"][i]])
        w.write_vector_bool([bool(b) for b in s["extra.target_bools"][i]])
        w.write_vector_int([int(v) for v in s["extra.image_permutation"][i]])
        w.write_vector_float([float(v) for v in s["extra.lane_vels"][i]])
        w.write_int(NUM_LANES)
        w.write_int(NUM_CURRENT)
        w.write_int(int(s["extra.targets_hit"][i]))
        w.write_int(TARGET_QUOTA)
        w.write_float(s["extra.juice_left"][i])
        w.write_float(self.r_scale)
        w.write_float(SPAWN_PROB)
        w.write_float(LEGEND_R)
        w.write_float(2 * LEGEND_R + self.r_scale)  # min_agent_x

    def deserialize_extra(self, r):
        out = {}
        out["last_fire_time"] = r.read_int()
        out["lane_directions"] = r.read_vector_bool()
        out["target_bools"] = r.read_vector_bool()
        out["image_permutation"] = r.read_vector_int()
        out["lane_vels"] = r.read_vector_float()
        r.read_int()  # num_lanes
        r.read_int()  # num_current_ship_types
        out["targets_hit"] = r.read_int()
        r.read_int()  # target_quota
        out["juice_left"] = r.read_float()
        r.read_float()  # r_scale
        r.read_float()  # spawn_prob
        r.read_float()  # legend_r
        r.read_float()  # min_agent_x
        return out


register_game("plunder")(Plunder)
