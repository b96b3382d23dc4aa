"""FruitBot: vertical scroller -- collect fruit, avoid food, shoot locks
(reference: games/fruitbot.cpp)."""

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
from procgen_tpu.games import register_game
from procgen_tpu.render import assets
from procgen_tpu.state import F32, I32, EnvState

COMPLETION_BONUS = 10.0
POSITIVE_REWARD = 1.0
PENALTY = -4.0

BARRIER = 1
OUT_OF_BOUNDS_WALL = 2
PLAYER_BULLET = 3
BAD_OBJ = 4
GOOD_OBJ = 7
LOCKED_DOOR = 10
LOCK = 11
PRESENT = 12

KEY_DURATION = 8
DOOR_ASPECT_RATIO = 3.25  # fruitbot.cpp:23

WALL_RY = 0.3
LOCK_RX = 0.25
LOCK_RY = 0.45

GOOD_ASSETS = tuple(f"misc_assets/fruit{i}.png" for i in range(1, 7))
BAD_ASSETS = tuple(f"misc_assets/food{i}.png" for i in range(1, 7))


class FruitBot(GameDef):
    name = "fruitbot"
    world_h_max = 60
    maxspeed = 0.85  # fruitbot.cpp:34
    mixrate = 0.5
    out_of_bounds_object = OUT_OF_BOUNDS_WALL
    bg_tile_ratio = -1.0  # fruitbot.cpp:38
    background_group = "topdown_backgrounds"  # fruitbot.cpp:43-45
    uses_pair_collisions = True  # bullets: collides_with_entities
    max_substeps = 8  # speed <= ~1.1 => int(4*speed) == 4
    entity_rotations = "axis"  # agent fixed at -pi/2

    def __init__(self, cfg):
        easy = cfg.distribution_mode == DistributionMode.easy
        self.easy = easy
        self.world_w = 10 if easy else 20  # choose_world_dim fruitbot.cpp:150-157
        self.world_w_max = self.world_w
        self.num_walls = 5 if easy else 10  # fruitbot.cpp:203-216
        self.object_group_size = 2 if easy else 6
        self.door_prob = 0.0 if easy else 0.125
        self.min_pct = 0.2 if easy else 0.1
        # worst case: agent + 2*num_walls barriers + door+lock on every wall
        # with part >= 2 (sum(parts) bounds how many) + presents + 19 good +
        # 19 bad + 2 live bullets (expire 8, cooldown 8)
        parts_total = 60 - 4 * self.num_walls - 4
        max_doors = min(self.num_walls, parts_total // 2)
        self.max_entities = (
            1 + 2 * self.num_walls + 2 * max_doors + self.world_w + 19 + 19 + 3
        )
        self.reset_max_draws = 2048
        self.good_aspects = np.asarray(
            [assets.aspect_ratio(n) for n in GOOD_ASSETS], F32
        )
        self.bad_aspects = np.asarray(
            [assets.aspect_ratio(n) for n in BAD_ASSETS], F32
        )

    def use_block_asset(self, type_):
        # fruitbot.cpp:137-139
        return type_ in (BARRIER, LOCKED_DOOR, PRESENT)

    def asset_map(self, cfg):
        # fruitbot.cpp:47-79
        return {
            O.PLAYER: ["misc_assets/robot_3Dblue.png"],
            BARRIER: ["misc_assets/tileStone_slope.png"],
            OUT_OF_BOUNDS_WALL: ["misc_assets/tileStone_slope.png"],
            PLAYER_BULLET: ["misc_assets/keyRed2.png"],
            BAD_OBJ: list(BAD_ASSETS),
            GOOD_OBJ: list(GOOD_ASSETS),
            LOCKED_DOOR: ["misc_assets/fenceYellow.png"],
            LOCK: ["misc_assets/lockRed2.png"],
            PRESENT: [f"misc_assets/present{i}.png" for i in range(1, 4)],
        }

    def tile_ratio_for(self, img_type, rx=None, ry=None):
        # get_tile_aspect_ratio (fruitbot.cpp:90-96)
        return jnp.where(
            img_type == BARRIER,
            F32(1.0),
            jnp.where(img_type == LOCKED_DOOR, F32(DOOR_ASPECT_RATIO), F32(0.0)),
        )

    def init_extra(self, cfg):
        return {"last_fire_time": jnp.asarray(0, I32)}

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        return state.replace(
            main_width=jnp.asarray(self.world_w, I32),
            main_height=jnp.asarray(60, I32),
        )

    def set_action_xy(self, cfg, state, move_action):
        # fruitbot.cpp:159-163: horizontal control, constant upward drift
        avx = (move_action // 3 - 1).astype(F32)
        return avx, F32(0.2), F32(0.0)

    def choose_center(self, cfg, state):
        # fruitbot.cpp:142-146: cy = agent->y + main_width / 2.0 - 2 * ry
        # promotes to double via the 2.0 literal; one narrowing into the
        # float center_y out-param
        ents = state.ents
        mw = state.main_width.astype(F32)
        cx = mw / 2
        if cfg.parity_mode:
            cy = (
                ents.y[eo.AGENT].astype(jnp.float64)
                + state.main_width.astype(jnp.float64) / 2.0
                - 2.0 * ents.ry[eo.AGENT].astype(jnp.float64)
            ).astype(F32)
        else:
            cy = ents.y[eo.AGENT] + mw / 2 - 2 * ents.ry[eo.AGENT]
        return cx, cy, mw

    def _add_walls(self, cfg, state, rs, curr_h, use_door):
        """add_walls (fruitbot.cpp:165-196); door math is computed always and
        selected, matching the reference's draw order exactly."""
        mw = F32(self.world_w)
        rs, u_pct = R.rs_rand01(rs)
        # pct = min_pct + .2 * rand01(): the double literal promotes the whole
        # expression, one rounding into float (fruitbot.cpp:170)
        pct = fm.dmuladd(cfg, u_pct, 0.2, self.min_pct)

        pct_door = pct + F32(0.1)
        # f32 chain order of fruitbot.cpp:173-174 (each op rounds)
        lock_pct_w = F32(np.float32(2) * np.float32(LOCK_RX) / np.float32(self.world_w))
        door_pct_w = F32(
            np.float32(WALL_RY) * np.float32(2) * np.float32(DOOR_ASPECT_RATIO)
            / np.float32(self.world_w)
        )
        # IEEE f32 divide + SEPARATE mul/add roundings (fruitbot.cpp:176-177,
        # no FMA on ivybridge) -- the unpinned "2*lock_pct_w + door_pct_w *
        # num_doors" contraction was the r4 fruitbot ent.rx regression
        num_doors = jnp.ceil(
            fm.fdiv(cfg, pct_door - 2 * lock_pct_w, door_pct_w)
        )
        pct = jnp.where(
            use_door,
            fm.fmuladd32(cfg, door_pct_w, num_doors, 2 * lock_pct_w),
            pct,
        )

        # materialize each product at its single f32 rounding so LLVM cannot
        # contract it into the subtractions that consume it (w2 = rw-w1-gapw,
        # fruitbot.cpp:181-182)
        gapw = fm.fmuladd32(cfg, pct, mw, F32(0.0))
        rs, u_w1 = R.rs_rand01(rs)
        w1 = fm.fmuladd32(cfg, u_w1, fm.fadd32(cfg, mw, -gapw), F32(0.0))
        w2 = fm.fadd32(cfg, fm.fadd32(cfg, mw, -w1), -gapw)
        ry = curr_h.astype(F32)

        state, _ = eo.add_entity_rxy(
            state, w1 / 2, ry, 0.0, 0.0, w1 / 2, WALL_RY, BARRIER
        )
        state, _ = eo.add_entity_rxy(
            state, mw - w2 / 2, ry, 0.0, 0.0, w2 / 2, WALL_RY, BARRIER
        )

        rs, is_on_right = R.rs_randn(rs, 2, active=use_door)
        iorf = is_on_right.astype(F32)
        # "(w1 + lock_rx) + is_on_right * (gapw - 2*lock_rx)" and
        # "(w1 + gapw/2) - (is_on_right*2-1) * lock_rx": pin the product-
        # into-add sites (fruitbot.cpp:189-190)
        lock_x = fm.fmuladd32(
            cfg, iorf, gapw - 2 * F32(LOCK_RX), w1 + F32(LOCK_RX)
        )
        door_x = fm.fadd32(
            cfg, w1 + gapw / 2, -((iorf * 2 - 1) * F32(LOCK_RX))
        )
        state, _ = eo.add_entity_rxy(
            state, door_x, ry, 0.0, 0.0, gapw / 2 - LOCK_RX, WALL_RY,
            LOCKED_DOOR, active=use_door,
        )
        # (ry - lock_ry) + wall_ry rounds left-to-right in the reference
        # (fruitbot.cpp:193); fm.seq pins the intermediate against XLA's
        # constant reassociation
        lock_y = fm.seq(cfg, ry - F32(LOCK_RY)) + F32(WALL_RY)
        state, _ = eo.add_entity_rxy(
            state, lock_x, lock_y, 0.0, 0.0, LOCK_RX, LOCK_RY,
            LOCK, active=use_door,
        )
        return state, rs

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        mw, mh = self.world_w, 60
        min_sep, buf_h = 4, 4

        rs, parts = ru.partition(
            rs, mh - min_sep * self.num_walls - buf_h, self.num_walls,
            mh - min_sep * self.num_walls - buf_h,
        )

        curr_h = jnp.asarray(0, I32)
        for k in range(self.num_walls):
            dy = min_sep + parts[k]
            curr_h = curr_h + dy
            # (dy > 5) && rand01() < door_prob -- && short-circuits the draw
            rs, u_door = R.rs_rand01(rs, active=dy > 5)
            use_door = (dy > 5) & (u_door < F32(self.door_prob))
            state, rs = self._add_walls(cfg, state, rs, curr_h, use_door)

        state = state.replace(
            ents=eo.write_slot(
                state.ents, eo.AGENT, y=state.ents.ry[eo.AGENT],
                rotation=F32(-np.pi / 2),
            )
        )

        rs, ng = R.rs_randn(rs, 10)
        num_good = ng + 10
        rs, nb = R.rs_randn(rs, 10)
        num_bad = nb + 10

        for i in range(mw):
            state, idx = eo.add_entity_rxy(
                state, i + 0.5, mh - 0.5, 0.0, 0.0, 0.5, 0.5, PRESENT
            )
            rs, th = R.rs_randn(rs, 3)  # choose_random_theme
            state = state.replace(
                ents=state.ents.replace(
                    image_theme=state.ents.image_theme.at[idx].set(th)
                )
            )

        for i in range(19):
            rs, state, _ = eo.spawn_entity_rxy(
                rs, state, 0.5, 0.5, GOOD_OBJ, 0.0, 0.0, F32(mw), F32(mh),
                active=i < num_good,
            )
        for i in range(19):
            rs, state, _ = eo.spawn_entity_rxy(
                rs, state, 0.5, 0.5, BAD_OBJ, 0.0, 0.0, F32(mw), F32(mh),
                active=i < num_bad,
            )

        # theme + fit_aspect_ratio sweep over good/bad objs, ascending slot
        # (entity-vector) order (fruitbot.cpp:243-248)
        E = state.ents.capacity
        ogs = self.object_group_size

        def body(i, carry):
            rs, image_theme, rx, ry = carry
            t = state.ents.type[i]
            is_obj = state.ents.alive[i] & ((t == GOOD_OBJ) | (t == BAD_OBJ))
            rs, th = R.rs_randn(rs, ogs, active=is_obj)
            image_theme = image_theme.at[i].set(
                jnp.where(is_obj, th, image_theme[i])
            )
            ar = jnp.where(
                t == GOOD_OBJ, jnp.asarray(self.good_aspects)[th], jnp.asarray(self.bad_aspects)[th]
            )
            new_ry = jnp.where(ar > 1, fm.fdiv(cfg, rx[i], ar), ry[i])
            new_rx = jnp.where(ar > 1, rx[i], ry[i] * ar)
            rx = rx.at[i].set(jnp.where(is_obj, new_rx, rx[i]))
            ry = ry.at[i].set(jnp.where(is_obj, new_ry, ry[i]))
            return rs, image_theme, rx, ry

        rs, image_theme, rx, ry = jax.lax.fori_loop(
            0, E, body,
            (rs, state.ents.image_theme, state.ents.rx, state.ents.ry),
        )
        state = state.replace(
            ents=state.ents.replace(image_theme=image_theme, rx=rx, ry=ry)
        )

        extra = dict(state.extra)
        extra["last_fire_time"] = jnp.asarray(0, I32)
        return state.replace(extra=extra), rs

    def handle_agent_collision(self, cfg, state: EnvState, mask) -> EnvState:
        # fruitbot.cpp:98-116; handlers don't mutate the agent box, so the
        # vectorized mask phase is exact
        ents = state.ents
        t = ents.type
        hit_barrier = jnp.any(mask & ((t == BARRIER) | (t == LOCKED_DOOR)))
        bad = mask & (t == BAD_OBJ)
        good = mask & (t == GOOD_OBJ)
        present = mask & (t == PRESENT)
        reward = (
            state.reward
            + jnp.sum(bad) * F32(PENALTY)
            + jnp.sum(good) * F32(POSITIVE_REWARD)
            + jnp.sum(present) * F32(COMPLETION_BONUS)
        )
        got_present = jnp.any(present)
        ents = ents.replace(will_erase=ents.will_erase | bad | good)
        return state.replace(
            ents=ents,
            reward=reward,
            done=state.done | hit_barrier | got_present,
            level_complete=state.level_complete | got_present,
        )

    def handle_collision_pairs(self, cfg, state: EnvState, pair_mask) -> EnvState:
        # fruitbot.cpp:118-135: bullet vs barrier / lock (+ matching door).
        # Walls are >= 4 apart in y, so at most one door matches a lock and
        # the reference's first-match break is equivalent to the masked form.
        ents = state.ents
        t = ents.type
        is_bullet = t == PLAYER_BULLET
        hit_barrier = jnp.any(pair_mask & is_bullet[:, None] & (t == BARRIER)[None, :], axis=1)
        lock_pairs = pair_mask & is_bullet[:, None] & (t == LOCK)[None, :]
        bullet_hit_lock = jnp.any(lock_pairs, axis=1)
        lock_hit = jnp.any(lock_pairs, axis=0)
        door_near = jnp.abs(ents.y[:, None] - ents.y[None, :]) < 1
        door_hit = (t == LOCKED_DOOR) & ents.alive & jnp.any(
            door_near & lock_hit[None, :], axis=1
        )
        erase = hit_barrier | bullet_hit_lock | lock_hit | door_hit
        return state.replace(
            ents=ents.replace(will_erase=ents.will_erase | erase)
        )

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)

        # fire key-bullet (fruitbot.cpp:253-264)
        fire = (state.special_action == 1) & (
            state.cur_time - state.extra["last_fire_time"] >= KEY_DURATION
        )
        ents = state.ents
        fields = eo.make_entity(
            ents.x[eo.AGENT], ents.y[eo.AGENT], 0.0, F32(0.5), 0.25, 0.25,
            PLAYER_BULLET,
        )
        fields["expire_time"] = jnp.asarray(KEY_DURATION, I32)
        fields["collides_with_entities"] = jnp.asarray(True)
        ents, _ = eo.append_entity(ents, fields, active=fire)
        extra = dict(state.extra)
        extra["last_fire_time"] = jnp.where(
            fire, state.cur_time, extra["last_fire_time"]
        )
        return state.replace(ents=ents, extra=extra)

    def serialize_extra(self, w, s, i):
        # fruitbot.cpp:266-276
        w.write_float(5.0)  # min_dim (constant)
        w.write_float(0.5)  # bullet_vscale (constant)
        w.write_int(int(s["extra.last_fire_time"][i]))

    def deserialize_extra(self, r):
        r.read_float()
        r.read_float()
        return {"last_fire_time": r.read_int()}


register_game("fruitbot")(FruitBot)
