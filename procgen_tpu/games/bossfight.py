"""Bossfight: dodge attack patterns, shoot the boss between shield phases
(reference: games/bossfight.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import objects as O
from procgen_tpu import fmath as fm
from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode
from procgen_tpu.engine import entity_ops as eo
from procgen_tpu.engine.base import GameDef, base_game_reset, base_game_step
from procgen_tpu.games import register_game
from procgen_tpu.render import assets
from procgen_tpu.state import F32, I32, EnvState

COMPLETION_BONUS = 10.0
POSITIVE_REWARD = 1.0

PLAYER_BULLET = 1
BOSS = 2
SHIELDS = 3
ENEMY_BULLET = 4
LASER_TRAIL = 5
REFLECTED_BULLET = 6
BARRIER = 7

BOSS_R = 3.0
NUM_ATTACK_MODES = 4
NUM_LASER_THEMES = 3
PLAYER_BULLET_VEL = 1.0
BOTTOM_MARGIN = 6.0
BOSS_VEL_TIMEOUT = 20
BOSS_DAMAGED_TIMEOUT = 40
MAX_ROUNDS = 5  # num_rounds = 1 + randn(5)

BOSS_SLOT = 1  # boss/shields appended right after the agent and never erased
SHIELDS_SLOT = 2

PI = float(np.float32(np.pi))  # the reference's `const float PI` (cpp-utils.h:12)

PLAYER_ASSETS = (
    "misc_assets/playerShip1_blue.png",
    "misc_assets/playerShip1_green.png",
    "misc_assets/playerShip2_orange.png",
    "misc_assets/playerShip3_red.png",
)
BOSS_ASSETS = (
    "misc_assets/enemyShipBlack1.png",
    "misc_assets/enemyShipBlue2.png",
    "misc_assets/enemyShipGreen3.png",
    "misc_assets/enemyShipRed4.png",
)
LASER_ASSETS = (
    "misc_assets/laserGreen14.png",
    "misc_assets/laserRed11.png",
    "misc_assets/laserBlue09.png",
)
BARRIER_ASSETS = (
    "misc_assets/spaceMeteors_001.png",
    "misc_assets/spaceMeteors_002.png",
    "misc_assets/spaceMeteors_003.png",
    "misc_assets/spaceMeteors_004.png",
    "misc_assets/meteorGrey_big1.png",
    "misc_assets/meteorGrey_big2.png",
    "misc_assets/meteorGrey_big3.png",
    "misc_assets/meteorGrey_big4.png",
)


class Bossfight(GameDef):
    name = "bossfight"
    timeout = 4000  # bossfight.cpp:63
    world_w_max = 20
    world_h_max = 20
    mixrate = 0.5
    maxspeed = 0.85
    background_group = "space_backgrounds"
    uses_pair_collisions = True
    max_substeps = 8
    entity_rotations = "free"  # enemy bullets spin at pi/8 per step
    # ~25 live enemy bullets x 9-step trails dominates; + barriers/bullets
    max_entities = 256

    def __init__(self, cfg):
        easy = cfg.distribution_mode == DistributionMode.easy
        self.boss_bullet_vel = 0.5 if easy else 0.75
        self.max_extra_invulnerable = 1 if easy else 3
        self.player_aspects = np.asarray(
            [assets.aspect_ratio(n) for n in PLAYER_ASSETS], F32
        )
        self.boss_aspects = np.asarray(
            [assets.aspect_ratio(n) for n in BOSS_ASSETS], F32
        )
        self.barrier_aspects = np.asarray(
            [assets.aspect_ratio(n) for n in BARRIER_ASSETS], F32
        )

    def asset_map(self, cfg):
        # bossfight.cpp:76-108 + reserved explosion frames
        return {
            O.PLAYER: list(PLAYER_ASSETS),
            BOSS: list(BOSS_ASSETS),
            ENEMY_BULLET: list(LASER_ASSETS),
            PLAYER_BULLET: list(LASER_ASSETS),
            SHIELDS: ["misc_assets/shield2.png"],
            BARRIER: list(BARRIER_ASSETS),
            O.EXPLOSION: ["misc_assets/explosion1.png"],
            O.EXPLOSION + 1: ["misc_assets/explosion2.png"],
            O.EXPLOSION + 2: ["misc_assets/explosion3.png"],
            O.EXPLOSION + 3: ["misc_assets/explosion4.png"],
            O.EXPLOSION + 4: ["misc_assets/explosion5.png"],
        }

    def center_agent(self, cfg):
        return False  # bossfight.cpp:210

    def init_extra(self, cfg):
        z = jnp.asarray(0, I32)
        return {
            "attack_modes": jnp.zeros((MAX_ROUNDS,), I32),
            "last_fire_time": z,
            "time_to_swap": z,
            "invulnerable_duration": z,
            "num_rounds": z,
            "round_num": z,
            "round_health": jnp.asarray(1, I32),
            "curr_vel_timeout": z,
            "attack_mode": z,
            "player_laser_theme": z,
            "boss_laser_theme": z,
            "damaged_until_time": z,
            "shields_are_up": jnp.asarray(False),
            "barriers_moves_right": jnp.asarray(False),
            "rand_pct": jnp.asarray(0.0, F32),
            "rand_fire_pct": jnp.asarray(0.0, F32),
            "rand_pct_x": jnp.asarray(0.0, F32),
            "rand_pct_y": jnp.asarray(0.0, F32),
        }

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        return state.replace(
            main_width=jnp.asarray(20, I32), main_height=jnp.asarray(20, I32)
        )

    def entity_draw_mask(self, cfg, state):
        # should_draw_entity: shields only while up (bossfight.cpp:122-127)
        return jnp.where(
            state.ents.type == SHIELDS,
            state.extra["shields_are_up"],
            jnp.ones_like(state.ents.alive),
        )

    def handle_agent_collision(self, cfg, state: EnvState, mask) -> EnvState:
        t = state.ents.type
        deadly = mask & ((t == BOSS) | (t == BARRIER) | (t == ENEMY_BULLET))
        return state.replace(done=state.done | jnp.any(deadly))

    def _prepare_boss(self, extra, ents, round_num):
        extra = dict(extra)
        extra["shields_are_up"] = jnp.asarray(True)
        extra["curr_vel_timeout"] = jnp.asarray(BOSS_VEL_TIMEOUT, I32)
        extra["time_to_swap"] = extra["invulnerable_duration"]
        extra["attack_mode"] = extra["attack_modes"][
            round_num % jnp.maximum(extra["num_rounds"], 1)
        ]
        ents = eo.write_slot(ents, BOSS_SLOT, vx=F32(0.0), vy=F32(0.0))
        return extra, ents

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        mw, mh = F32(20.0), F32(20.0)
        extra = dict(state.extra)

        # boss + shields (bossfight.cpp:212-218)
        rs, boss_theme = R.rs_randn(rs, len(BOSS_ASSETS))
        boss_ry = fm.fdiv(cfg, BOSS_R, jnp.asarray(self.boss_aspects)[boss_theme])
        boss = eo.make_entity(mw / 2, mh / 2, 0.0, 0.0, BOSS_R, boss_ry, BOSS)
        boss["image_theme"] = boss_theme
        ents, _ = eo.append_entity(state.ents, boss, active=True)
        # "1.2 * boss->ry" promotes to double and narrows on the Entity ctor
        # float param (bossfight.cpp:217); 1.2*BOSS_R is host-side f64 math
        shields = eo.make_entity(
            mw / 2, mh / 2, 0.0, 0.0, 1.2 * BOSS_R,
            fm.dmul(cfg, boss_ry, 1.2), SHIELDS,
        )
        ents, _ = eo.append_entity(ents, shields, active=True)
        state = state.replace(ents=ents)

        rs, rh = R.rs_randn(rs, 9)
        round_health = rh + 1
        rs, nr = R.rs_randn(rs, 5)
        num_rounds = nr + 1
        rs, inv = R.rs_randn(rs, self.max_extra_invulnerable + 1)
        invulnerable = inv + 2

        state = state.replace(
            ents=eo.write_slot(
                state.ents, BOSS_SLOT,
                health=(round_health * num_rounds).astype(F32),
            )
        )

        rs, agent_theme = R.rs_randn(rs, len(PLAYER_ASSETS))
        rs, player_laser = R.rs_randn(rs, NUM_LASER_THEMES)
        rs, boss_laser = R.rs_randn(rs, NUM_LASER_THEMES)

        attack_modes = jnp.zeros((MAX_ROUNDS,), I32)
        for i in range(MAX_ROUNDS):
            rs, m = R.rs_randn(rs, NUM_ATTACK_MODES, active=i < num_rounds)
            attack_modes = attack_modes.at[i].set(
                jnp.where(i < num_rounds, m, 0)
            )

        extra["attack_modes"] = attack_modes
        extra["round_health"] = round_health
        extra["num_rounds"] = num_rounds
        extra["invulnerable_duration"] = invulnerable
        extra["player_laser_theme"] = player_laser
        extra["boss_laser_theme"] = boss_laser
        extra["round_num"] = jnp.asarray(0, I32)
        extra["last_fire_time"] = jnp.asarray(0, I32)
        extra["damaged_until_time"] = jnp.asarray(0, I32)
        extra, ents = self._prepare_boss(extra, state.ents, jnp.asarray(0, I32))
        state = state.replace(ents=ents)

        # agent sizing + reposition (bossfight.cpp:242-246)
        arx = F32(0.75)
        ary = fm.fdiv(cfg, arx, jnp.asarray(self.player_aspects)[agent_theme])
        state = state.replace(
            ents=eo.write_slot(
                state.ents, eo.AGENT, rx=arx, ry=ary, image_theme=agent_theme
            )
        )

        def try_pos(rs, active):
            # reposition_agent (bag.cpp:531-539): "rand01() * (mw - 2*rx)
            # + rx" with SEPARATE f32 roundings (no FMA) -- the unpinned
            # contraction here was the r5 1000-step agent-x divergence
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
        state = state.replace(
            ents=eo.write_slot(state.ents, eo.AGENT, y=state.ents.ry[eo.AGENT])
        )

        rs, bmr = R.rs_randbool(rs)
        extra["barriers_moves_right"] = bmr

        # spawn_barriers (bossfight.cpp:328-346)
        rs, nb = R.rs_randn(rs, 3)
        num_barriers = nb + 1
        barrier_r = F32(0.6)
        ary_now = state.ents.ry[eo.AGENT]
        for i in range(3):
            active = i < num_barriers
            # "2*ry + barrier_r + .5" and "(BOTTOM_MARGIN - min_y) -
            # barrier_r" round left-to-right in f32; fm.seq pins the
            # intermediates against XLA folding the constants together
            # (e.g. 6 - min_y - 0.6 -> 5.4 - min_y, a different rounding)
            min_y = fm.seq(cfg, 2 * ary_now + barrier_r) + F32(0.5)
            rs, uy = R.rs_rand01(rs, active=active)
            ent_y = fm.fmuladd32(
                cfg, uy,
                fm.seq(cfg, F32(BOTTOM_MARGIN) - min_y) - barrier_r,
                min_y,
            )
            rs, ux = R.rs_rand01(rs, active=active)
            ent_x = fm.fmuladd32(cfg, ux, mw - 2 * barrier_r, barrier_r)
            rs, th = R.rs_randn(rs, len(BARRIER_ASSETS), active=active)
            fields = eo.make_entity(
                ent_x, ent_y, 0.0, 0.0, barrier_r,
                fm.fdiv(cfg, barrier_r, jnp.asarray(self.barrier_aspects)[th]),
                BARRIER,
            )
            fields["image_theme"] = th
            fields["health"] = F32(3.0)
            fields["collides_with_entities"] = jnp.asarray(True)
            no_coll = ~jnp.any(
                eo.has_any_collision_mask(
                    state.ents, fields["x"], fields["y"], fields["rx"],
                    fields["ry"],
                )
            )
            ents, _ = eo.append_entity(
                state.ents, fields, active=active & no_coll
            )
            state = state.replace(ents=ents)

        return state.replace(extra=extra), rs

    def handle_collision_pairs(self, cfg, state: EnvState, pair_mask) -> EnvState:
        E = state.ents.capacity

        # --- phase A: player bullets (descending), exact sequential sweep
        # (bag.cpp:719-741); round advances mid-sweep flip shields for
        # later-processed bullets ---
        def body(k, st):
            i = E - 1 - k
            ents = st.ents
            ex = st.extra
            up = ex["shields_are_up"]
            is_pb = (
                (ents.type[i] == PLAYER_BULLET)
                & ents.alive[i]
                & ~ents.will_erase[i]
            )
            valid = pair_mask[i] & ~ents.will_erase & is_pb
            hit_shield = valid[SHIELDS_SLOT] & up
            hit_boss = valid[BOSS_SLOT] & ~up

            # reflect (bossfight.cpp:135-147)
            # "PI * (1.25 + .5 * rand_pct)" and the VEL*trig*.5 products are
            # double chains narrowed at the float stores (bossfight.cpp:137-139)
            theta_r = fm.narrow(
                fm.wide(cfg, F32(PI)) * (1.25 + 0.5 * fm.wide(cfg, ex["rand_pct"]))
            )
            ents = eo.write_slot_masked(
                ents, i, hit_shield,
                type=jnp.asarray(REFLECTED_BULLET, I32),
                vy=fm.narrow(F32(PLAYER_BULLET_VEL) * fm.dsin(cfg, theta_r) * 0.5),
                vx=fm.narrow(F32(PLAYER_BULLET_VEL) * fm.dcos(cfg, theta_r) * 0.5),
                expire_time=jnp.asarray(4, I32),
                life_time=jnp.asarray(0, I32),
                alpha_decay=F32(0.8),
            )

            # boss damage (bossfight.cpp:148-164)
            health = ents.health[BOSS_SLOT] - jnp.where(hit_boss, 1.0, 0.0)
            ents = eo.write_slot_masked(ents, BOSS_SLOT, hit_boss, health=health)
            rh = jnp.maximum(ex["round_health"], 1)
            round_tick = hit_boss & (health.astype(I32) % rh == 0)
            reward = st.reward + jnp.where(round_tick, F32(POSITIVE_REWARD), 0.0)
            dead = round_tick & (health == 0)
            reward = reward + jnp.where(dead, F32(COMPLETION_BONUS), 0.0)
            done = st.done | dead
            level_complete = st.level_complete | dead

            advance = round_tick & ~dead
            ex = dict(ex)
            round_num = ex["round_num"] + advance.astype(I32)
            ex["round_num"] = round_num
            ex2, ents2 = self._prepare_boss(ex, ents, round_num)
            ex = {
                k2: jnp.where(advance, ex2[k2], ex[k2]) for k2 in ex
            }
            ents = jax.tree_util.tree_map(
                lambda a, b: jnp.where(advance, a, b), ents2, ents
            )
            ex["curr_vel_timeout"] = jnp.where(
                advance, BOSS_DAMAGED_TIMEOUT, ex["curr_vel_timeout"]
            )
            ex["damaged_until_time"] = jnp.where(
                advance, st.cur_time + BOSS_DAMAGED_TIMEOUT,
                ex["damaged_until_time"],
            )

            # erase + explosion child (bossfight.cpp:166-172)
            ents = ents.replace(
                will_erase=ents.will_erase.at[i].set(
                    ents.will_erase[i] | hit_boss
                )
            )
            expl = eo.make_entity(
                ents.x[i], ents.y[i], ents.vx[BOSS_SLOT], ents.vy[BOSS_SLOT],
                0.5 * ents.rx[i], 0.5 * ents.rx[i], O.EXPLOSION,
            )
            ents, _ = eo.append_entity(ents, expl, active=hit_boss)
            return st.replace(
                ents=ents, extra=ex, reward=reward, done=done,
                level_complete=level_complete,
            )

        state = jax.lax.fori_loop(0, E, body, state)

        # --- phase B: barrier srcs (low slots, processed after bullets in
        # the reference's descending sweep, bossfight.cpp:173-190).  The
        # explosion APPEND ORDER is part of the byte contract (VERDICT r5:
        # the 1000-step sweep caught two same-step explosions swapped), so
        # this is a per-barrier descending sweep like the reference's,
        # grouped by barrier slot descending, targets descending within
        # each, with will_erase threaded live.  Barrier health never drops
        # in bossfight (the src->health <= 0 branch is dead code: nothing
        # decrements it), so only the bullet/trail target paths exist.
        E_ = state.ents.capacity

        def barrier_body(k, st):
            i = E_ - 1 - k
            ents = st.ents
            is_bar = (
                (ents.type[i] == BARRIER)
                & ents.alive[i]
                & ~ents.will_erase[i]
            )
            valid = pair_mask[i] & ~ents.will_erase & is_bar
            t = ents.type
            bullet_tgt = valid & (
                (t == ENEMY_BULLET) | (t == PLAYER_BULLET)
            )
            trail_tgt = valid & (t == LASER_TRAIL)
            ents = ents.replace(
                will_erase=ents.will_erase | bullet_tgt | trail_tgt
            )
            fields = {
                f: jnp.broadcast_to(v, (E_,)) for f, v in eo.make_entity(
                    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, O.EXPLOSION
                ).items()
            }
            fields = dict(
                fields, x=ents.x, y=ents.y,
                vx=jnp.zeros((E_,), F32), vy=jnp.zeros((E_,), F32),
                rx=0.5 * ents.rx, ry=0.5 * ents.rx,
            )
            ents = eo.append_entities_masked(
                ents, fields, bullet_tgt, descending=True
            )
            return st.replace(ents=ents)

        state = jax.lax.fori_loop(0, E_, barrier_body, state)
        return state

    def _boss_fire_thetas(self, cfg, state):
        """One (active, theta) pair per potential bullet slot (<= 8)."""
        ex = state.extra
        ct = state.cur_time
        mode = ex["attack_mode"]
        damaged = ex["damaged_until_time"] >= ct
        up = ex["shields_are_up"]
        i = jnp.arange(8)

        # attack_mode_0 (bossfight.cpp:271-277): "PI * 1.5" promotes to
        # double; "(i - 2) * PI / 8" stays f32; the sum is double, narrowed
        # once at the float theta parameter
        a0 = (ct % 8 == 0) & (i < 5)
        th0 = fm.narrow(
            fm.wide(cfg, (i.astype(F32) - 2) * F32(PI) / 8) + PI * 1.5
        )
        # attack_mode_1 (:279-287): "PI * (1.25 + .5 * k / 8.0)" is a double
        # chain; "i * PI / 2" is f32; one narrowing at the theta parameter
        k1 = jnp.abs(8 - ((ct // 5) % 16))
        a1 = (ct % 5 == 0) & (i < 4)
        th1 = fm.narrow(
            PI * (1.25 + fm.wide(cfg, k1.astype(F32)) / 16.0)
            + fm.wide(cfg, i.astype(F32) * F32(PI) / 2)
        )
        # attack_mode_2 (:289-299): "2*PI/num_bullets*i + offset" is an f32
        # mul+add; separate roundings (no FMA contraction)
        a2 = (ct % 10 == 0) & (i < 8)
        th2 = fm.fmuladd32(
            cfg, i.astype(F32), F32(2 * PI / 8), ex["rand_pct"] * 2 * PI
        )
        # attack_mode_3 (:301-305)
        a3 = (ct % 4 == 0) & (i < 1)
        th3 = jnp.full((8,), PI * (1 + ex["rand_pct"]), F32)
        # passive (:265-269)
        ap = (ex["rand_fire_pct"] < F32(0.1)) & (i < 1)

        th_active = jnp.select(
            [mode == 0, mode == 1, mode == 2], [th0, th1, th2], th3
        )
        a_active = jnp.select(
            [mode == 0, mode == 1, mode == 2], [a0, a1, a2], a3
        )
        active = jnp.where(damaged, False, jnp.where(up, a_active, ap))
        theta = jnp.where(up, th_active, th3)
        return active, theta

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)
        extra = dict(state.extra)
        mw, mh = F32(20.0), F32(20.0)
        ents = state.ents

        # shields track the boss (bossfight.cpp:352-353)
        ents = eo.write_slot(
            ents, SHIELDS_SLOT, x=ents.x[BOSS_SLOT], y=ents.y[BOSS_SLOT]
        )

        mt = state.rng
        mt, rand_pct = R.mt_rand01(mt)
        mt, rand_fire_pct = R.mt_rand01(mt)
        mt, rand_pct_x = R.mt_rand01(mt)
        mt, rand_pct_y = R.mt_rand01(mt)
        extra["rand_pct"] = rand_pct
        extra["rand_fire_pct"] = rand_fire_pct
        extra["rand_pct_x"] = rand_pct_x
        extra["rand_pct_y"] = rand_pct_y
        state = state.replace(rng=mt, extra=extra)

        # boss waypoint motion + shield swap clock (bossfight.cpp:360-381)
        timeout_hit = extra["curr_vel_timeout"] <= 0
        dest_x = fm.fmuladd32(cfg, rand_pct_x, mw - 2 * BOSS_R, F32(BOSS_R))
        dest_y = fm.fmuladd32(
            cfg, rand_pct_y, mh - 2 * BOSS_R - BOTTOM_MARGIN, F32(BOSS_R)
        ) + F32(BOTTOM_MARGIN)
        bvx = fm.fdiv(cfg, dest_x - ents.x[BOSS_SLOT], F32(BOSS_VEL_TIMEOUT))
        bvy = fm.fdiv(cfg, dest_y - ents.y[BOSS_SLOT], F32(BOSS_VEL_TIMEOUT))
        ents = eo.write_slot_masked(ents, BOSS_SLOT, timeout_hit, vx=bvx, vy=bvy)
        swap_now = timeout_hit & (extra["time_to_swap"] <= 0)
        up = extra["shields_are_up"]
        extra["time_to_swap"] = jnp.where(
            timeout_hit,
            jnp.where(
                swap_now,
                jnp.where(up, 500, extra["invulnerable_duration"]),
                extra["time_to_swap"] - 1,
            ),
            extra["time_to_swap"],
        )
        extra["shields_are_up"] = jnp.where(swap_now, ~up, up)
        extra["curr_vel_timeout"] = jnp.where(
            timeout_hit, BOSS_VEL_TIMEOUT, extra["curr_vel_timeout"] - 1
        )

        # player fire (bossfight.cpp:383-390)
        fire = (state.special_action == 1) & (
            state.cur_time - extra["last_fire_time"] >= 3
        )
        bullet = eo.make_entity(
            ents.x[eo.AGENT], ents.y[eo.AGENT], 0.0, F32(PLAYER_BULLET_VEL),
            0.25, 0.25, PLAYER_BULLET,
        )
        bullet["image_theme"] = extra["player_laser_theme"]
        bullet["collides_with_entities"] = jnp.asarray(True)
        bullet["expire_time"] = jnp.asarray(25, I32)
        ents, _ = eo.append_entity(ents, bullet, active=fire)
        extra["last_fire_time"] = jnp.where(
            fire, state.cur_time, extra["last_fire_time"]
        )
        state = state.replace(ents=ents, extra=extra)

        # boss attacks (bossfight.cpp:392-398): enemy-bullet fan
        active, theta = self._boss_fire_thetas(cfg, state)
        bx = state.ents.x[BOSS_SLOT]
        by = state.ents.y[BOSS_SLOT]
        vel = F32(self.boss_bullet_vel)
        for k in range(8):
            b = eo.make_entity(
                bx, by,
                # "vel * cos(theta)": the game TU's cos is the C double
                # function; vel promotes, one narrowing (bossfight.cpp:259)
                fm.narrow(fm.wide(cfg, vel) * fm.dcos(cfg, theta[k])),
                fm.narrow(fm.wide(cfg, vel) * fm.dsin(cfg, theta[k])),
                0.5, 0.5, ENEMY_BULLET,
            )
            b["image_theme"] = extra["boss_laser_theme"]
            b["expire_time"] = jnp.asarray(50, I32)
            b["vrot"] = F32(PI / 8)
            ents, _ = eo.append_entity(state.ents, b, active=active[k])
            state = state.replace(ents=ents)

        # damaged_mode explosions (bossfight.cpp:307-313)
        damaged = extra["damaged_until_time"] >= state.cur_time
        spawn_expl = damaged & (state.cur_time % 3 == 0)
        ents = state.ents
        # "boss->x + (2*rand_pct_x - 1) * boss->rx" rounds the product and
        # add separately (bossfight.cpp:310-311, no FMA)
        pos_x = fm.fmuladd32(
            cfg, 2 * rand_pct_x - 1, ents.rx[BOSS_SLOT], ents.x[BOSS_SLOT]
        )
        pos_y = fm.fmuladd32(
            cfg, 2 * rand_pct_y - 1, ents.ry[BOSS_SLOT], ents.y[BOSS_SLOT]
        )
        expl = eo.make_entity(pos_x, pos_y, 0.0, 0.0, 0.75, 0.75, O.EXPLOSION)
        ents, _ = eo.append_entity(ents, expl, active=spawn_expl)

        # laser trails, one per live enemy bullet, reverse slot order
        # (bossfight.cpp:419-431)
        E = ents.capacity
        is_eb = ents.alive & (ents.type == ENEMY_BULLET)
        fields = {
            k: jnp.broadcast_to(v, (E,))
            for k, v in eo.make_entity(0, 0, 0, 0, 0, 0, LASER_TRAIL).items()
        }
        fields = dict(
            fields,
            x=ents.x, y=ents.y, vx=ents.vx * 0.5, vy=ents.vy * 0.5,
            rx=ents.rx, ry=ents.ry,
            alpha_decay=jnp.full((E,), 0.7, F32),
            image_type=jnp.full((E,), ENEMY_BULLET, I32),
            image_theme=jnp.broadcast_to(extra["boss_laser_theme"], (E,)),
            vrot=ents.vrot, rotation=ents.rotation,
            expire_time=jnp.full((E,), 8, I32),
        )
        ents = eo.append_entities_masked(ents, fields, is_eb, descending=True)

        return state.replace(ents=ents, extra=extra)

    def serialize_extra(self, w, s, i):
        # bossfight.cpp:437-462
        nr = int(s["extra.num_rounds"][i])
        w.write_vector_int([int(v) for v in s["extra.attack_modes"][i][:nr]])
        w.write_int(int(s["extra.last_fire_time"][i]))
        w.write_int(int(s["extra.time_to_swap"][i]))
        w.write_int(int(s["extra.invulnerable_duration"][i]))
        w.write_int(500)  # vulnerable_duration
        w.write_int(nr)
        w.write_int(int(s["extra.round_num"][i]))
        w.write_int(int(s["extra.round_health"][i]))
        w.write_int(BOSS_VEL_TIMEOUT)
        w.write_int(int(s["extra.curr_vel_timeout"][i]))
        w.write_int(int(s["extra.attack_mode"][i]))
        w.write_int(int(s["extra.player_laser_theme"][i]))
        w.write_int(int(s["extra.boss_laser_theme"][i]))
        w.write_int(int(s["extra.damaged_until_time"][i]))
        w.write_bool(bool(s["extra.shields_are_up"][i]))
        w.write_bool(bool(s["extra.barriers_moves_right"][i]))
        w.write_float(0.1)  # base_fire_prob
        w.write_float(self.boss_bullet_vel)
        w.write_float(0.1)  # barrier_vel
        w.write_float(0.025)  # barrier_spawn_prob
        w.write_float(s["extra.rand_pct"][i])
        w.write_float(s["extra.rand_fire_pct"][i])
        w.write_float(s["extra.rand_pct_x"][i])
        w.write_float(s["extra.rand_pct_y"][i])

    def deserialize_extra(self, r):
        out = {}
        modes = r.read_vector_int()
        out["attack_modes"] = list(modes) + [0] * (MAX_ROUNDS - len(modes))
        out["last_fire_time"] = r.read_int()
        out["time_to_swap"] = r.read_int()
        out["invulnerable_duration"] = r.read_int()
        r.read_int()  # vulnerable_duration
        out["num_rounds"] = r.read_int()
        out["round_num"] = r.read_int()
        out["round_health"] = r.read_int()
        r.read_int()  # boss_vel_timeout
        out["curr_vel_timeout"] = r.read_int()
        out["attack_mode"] = r.read_int()
        out["player_laser_theme"] = r.read_int()
        out["boss_laser_theme"] = r.read_int()
        out["damaged_until_time"] = r.read_int()
        out["shields_are_up"] = r.read_bool()
        out["barriers_moves_right"] = r.read_bool()
        r.read_float()  # base_fire_prob
        r.read_float()  # boss_bullet_vel
        r.read_float()  # barrier_vel
        r.read_float()  # barrier_spawn_prob
        out["rand_pct"] = r.read_float()
        out["rand_fire_pct"] = r.read_float()
        out["rand_pct_x"] = r.read_float()
        out["rand_pct_y"] = r.read_float()
        return out


register_game("bossfight")(Bossfight)
