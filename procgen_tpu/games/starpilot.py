"""StarPilot: side-scrolling shooter driven by a pre-rolled spawner timeline
(reference: games/starpilot.cpp)."""

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

V_SCALE = 2.0 / 5.0
BG_RATIO = 18.0
ENEMY_REWARD = 1.0
COMPLETION_BONUS = 10.0

BULLET_PLAYER = 1
BULLET2 = 2
BULLET3 = 3
FLYER = 4
METEOR = 5
CLOUD = 6
TURRET = 7
FAST_FLYER = 8
FINISH_LINE = 9

SHOOTER_WIN_TIME = 500
NUM_BASIC_OBJECTS = 9
NUM_SHIP_THEMES = 7
PI = float(np.float32(np.pi))  # the reference's `const float PI` (cpp-utils.h:12)

MAX_SPAWNERS = 320  # <= 51 timeline slots x group <= 6

SPAWNER_FIELDS = (
    "x", "y", "vx", "vy", "rx", "ry", "type", "image_theme", "render_z",
    "fire_time", "spawn_time", "health", "rotation",
)

TURRET_ASSETS = (
    "misc_assets/spaceStation_018.png",
    "misc_assets/spaceStation_019.png",
)
FINISH_ASSETS = tuple(
    f"misc_assets/spaceRockets_00{i}.png" for i in range(1, 5)
)


def _is_destructible(t):
    return (t == FLYER) | (t == FAST_FLYER) | (t == TURRET) | (t == METEOR)


def _is_lethal(t):
    return (
        (t == FLYER) | (t == FAST_FLYER) | (t == BULLET2) | (t == BULLET3)
        | (t == TURRET) | (t == METEOR)
    )


class StarPilot(GameDef):
    name = "starpilot"
    world_w_max = 16
    world_h_max = 16
    background_group = "space_backgrounds"
    uses_pair_collisions = True
    entity_rotations = "free"
    max_substeps = 8
    max_entities = 128

    def __init__(self, cfg):
        mode = cfg.distribution_mode
        # init_hps (starpilot.cpp:147-224): per-type tables, mode-scaled
        hp_vs = np.ones(NUM_BASIC_OBJECTS, np.float32)
        hp_healths = np.zeros(NUM_BASIC_OBJECTS, np.float32)
        hp_weight = np.ones(NUM_BASIC_OBJECTS, np.float32)
        hp_object_r = np.full(NUM_BASIC_OBJECTS, 0.5, np.float32)
        default_bullet_r = 1 / 2.5
        if mode == DistributionMode.easy:
            hp_weight[[METEOR, CLOUD, TURRET, FAST_FLYER]] = 0
            hp_vs[FLYER] = 0.75
            hp_vs[BULLET2] = 1.25
            hp_healths[TURRET] = 5
            hp_healths[FLYER] = 2
            hp_healths[FAST_FLYER] = 1
            self.maxspeed = 0.75
        elif mode == DistributionMode.hard:
            hp_vs[BULLET2] = 2
            hp_healths[TURRET] = 5
            hp_healths[FLYER] = 2
            hp_healths[FAST_FLYER] = 1
            self.maxspeed = 0.75
        elif mode == DistributionMode.extreme:
            hp_vs[BULLET2] = 2
            hp_healths[TURRET] = 10
            hp_healths[FLYER] = 5
            hp_healths[FAST_FLYER] = 2
            self.maxspeed = 0.5
            default_bullet_r = 1 / 5
        else:
            raise ValueError(f"starpilot does not support mode {mode}")
        hp_bullet_r = np.full(NUM_BASIC_OBJECTS, default_bullet_r, np.float32)
        hp_healths[METEOR] = 500
        hp_vs[FAST_FLYER] = 1.5
        hp_vs[BULLET_PLAYER] = 2
        hp_vs[BULLET3] = 2
        hp_object_r[TURRET] = 2
        hp_object_r[METEOR] = 2
        hp_object_r[CLOUD] = 2
        hp_weight[FLYER] = 3
        hp_weight[[BULLET_PLAYER, BULLET2, BULLET3]] = 0
        self.hp_vs = np.asarray(hp_vs)
        self.hp_healths = np.asarray(hp_healths)
        self.hp_weight = hp_weight
        self.hp_bullet_r = np.asarray(hp_bullet_r)
        self.hp_object_r = np.asarray(hp_object_r)
        self.total_prob_weight = float(hp_weight[2:].sum())
        self.hp_slow_v = 0.5
        self.can_spawn_left = mode != DistributionMode.easy
        self.turret_aspects = np.asarray(
            [assets.aspect_ratio(n) for n in TURRET_ASSETS], F32
        )
        self.finish_aspects = np.asarray(
            [assets.aspect_ratio(n) for n in FINISH_ASSETS], F32
        )

    def asset_map(self, cfg):
        # starpilot.cpp:61-107
        ships = [f"misc_assets/spaceShips_00{i}.png" for i in range(1, 8)]
        return {
            O.PLAYER: ["misc_assets/playerShip2_blue.png"],
            BULLET_PLAYER: ["misc_assets/towerDefense_tile295.png"],
            BULLET2: ["misc_assets/towerDefense_tile296.png"],
            BULLET3: ["misc_assets/towerDefense_tile297.png"],
            FLYER: ships,
            FAST_FLYER: ships,
            METEOR: [
                "misc_assets/spaceMeteors_001.png",
                "misc_assets/spaceMeteors_002.png",
                "misc_assets/spaceMeteors_003.png",
                "misc_assets/spaceMeteors_004.png",
                "misc_assets/meteorGrey_big1.png",
                "misc_assets/meteorGrey_big2.png",
                "misc_assets/meteorGrey_big3.png",
                "misc_assets/meteorGrey_big4.png",
            ],
            CLOUD: [f"misc_assets/spaceEffect{i}.png" for i in range(1, 10)],
            TURRET: list(TURRET_ASSETS),
            FINISH_LINE: list(FINISH_ASSETS),
            O.EXPLOSION: ["misc_assets/explosion1.png"],
            O.EXPLOSION + 1: ["misc_assets/explosion2.png"],
            O.EXPLOSION + 2: ["misc_assets/explosion3.png"],
            O.EXPLOSION + 3: ["misc_assets/explosion4.png"],
            O.EXPLOSION + 4: ["misc_assets/explosion5.png"],
        }

    def center_agent(self, cfg):
        return False  # starpilot.cpp:333

    def dynamic_bg_rect(self, cfg, states):
        """Batched scroll-blit params (starpilot.cpp:110-127)."""
        scale = 64.0 / 16.0
        bg_k = 3.0
        t = states.cur_time.astype(F32)
        x0 = -t * scale * F32(self.hp_slow_v) * 2 / states.char_dim
        h = jnp.full_like(x0, 64.0 * bg_k)
        w = h * BG_RATIO
        y0 = jnp.full_like(x0, -64.0 * (bg_k - 1) / 2)
        n_tiles = int((64.0 * bg_k * BG_RATIO) / (64.0 * bg_k))
        tile_w = w / n_tiles
        return x0, tile_w, w, y0, h

    def dynamic_background(self, cfg, state, out, SX, SY, pack):
        """Scrolling tiled space background (starpilot.cpp:110-127)."""
        if not cfg.use_backgrounds:
            return out
        scale = 64.0 / 16.0
        bg_k = 3.0
        t = state.cur_time.astype(F32)
        x_off = -t * scale * F32(self.hp_slow_v) * 2 / state.char_dim
        h = 64.0 * bg_k
        w = h * BG_RATIO
        y0 = -64.0 * (bg_k - 1) / 2
        # tile_image with ratio 1: num_tiles = int(w / h), square tiles
        n_tiles = int(w / h)
        tile_w = w / n_tiles
        u_raw = (SX - x_off) / tile_w
        u = u_raw - jnp.floor(u_raw)
        v = (SY - y0) / h
        inside = (SX >= x_off) & (SX < x_off + w) & (v >= 0) & (v < 1)
        bg_atlas = jnp.asarray(pack.bg_atlas)
        bg_dims = jnp.asarray(pack.bg_dims)
        bgi = state.background_index
        bw = bg_dims[bgi, 0]
        bh = bg_dims[bgi, 1]
        su = jnp.clip((u * bw.astype(F32)).astype(I32), 0, bw - 1)
        sv = jnp.clip((v * bh.astype(F32)).astype(I32), 0, bh - 1)
        col = bg_atlas[bgi, sv, su].astype(F32)
        return jnp.where(inside[..., None], col, out)

    def init_extra(self, cfg):
        d = {}
        for f in SPAWNER_FIELDS:
            dtype = I32 if f in (
                "type", "image_theme", "render_z", "fire_time", "spawn_time"
            ) else F32
            d[f"sp_{f}"] = jnp.zeros((MAX_SPAWNERS,), dtype)
        d["sp_count"] = jnp.asarray(0, I32)
        return d

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        return state.replace(
            main_width=jnp.asarray(16, I32), main_height=jnp.asarray(16, I32)
        )

    def handle_agent_collision(self, cfg, state: EnvState, mask) -> EnvState:
        # starpilot.cpp:129-139
        t = state.ents.type
        finish = jnp.any(mask & (t == FINISH_LINE))
        dead = jnp.any(mask & _is_lethal(t))
        return state.replace(
            done=state.done | finish | dead,
            reward=state.reward + jnp.where(finish, F32(COMPLETION_BONUS), 0.0),
            level_complete=state.level_complete | finish,
        )

    def handle_collision_pairs(self, cfg, state: EnvState, pair_mask) -> EnvState:
        """starpilot.cpp:141-148: each player bullet damages its highest-index
        destructible (non-cloud) target, sequential descending."""
        E = state.ents.capacity
        idxs = jnp.arange(E)

        def body(k, st):
            i = E - 1 - k
            ents = st.ents
            is_pb = (
                (ents.type[i] == BULLET_PLAYER)
                & ents.alive[i] & ~ents.will_erase[i]
            )
            valid = (
                pair_mask[i] & ~ents.will_erase & is_pb
                & _is_destructible(ents.type) & (ents.type != CLOUD)
            )
            j = jnp.max(jnp.where(valid, idxs, -1))
            hit = j >= 0
            jc = jnp.maximum(j, 0)
            we = ents.will_erase.at[i].set(ents.will_erase[i] | hit)
            health = ents.health.at[jc].add(jnp.where(hit, -1.0, 0.0))
            ents = ents.replace(will_erase=we, health=health)
            expl = eo.make_entity(
                ents.x[i], ents.y[i], ents.vx[jc], ents.vy[jc],
                0.5 * ents.rx[i], 0.5 * ents.rx[i], O.EXPLOSION,
            )
            ents, _ = eo.append_entity(ents, expl, active=hit)
            return st.replace(ents=ents)

        return jax.lax.fori_loop(0, E, body, state)

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)

        # spawner timeline (add_spawners, starpilot.cpp:226-327).  The draws
        # are sequential; the table writes are staged in per-candidate lists
        # and assembled with one stable compaction (keeps the jit graph small)
        count = jnp.asarray(0, I32)
        weights = jnp.asarray(self.hp_weight)

        rs, t0 = R.rs_randint(rs, 10, 30)
        t = 1 + t0
        MAX_ITERS = 51  # t advances >= 10 per iteration up to 500

        C = MAX_ITERS * 5
        int_fields = ("type", "image_theme", "render_z", "fire_time", "spawn_time")
        cand = {
            f: jnp.zeros((C,), I32 if f in int_fields else F32)
            for f in SPAWNER_FIELDS
        }
        on_v0 = jnp.zeros((C,), jnp.bool_)
        cum_w = jnp.cumsum(weights[2:])

        def body(k, carry):
            rs, t, count, cand, on_v, iv = carry
            j = k % 5  # k = i * 5 + j
            at_j0 = j == 0
            on = t <= SHOOTER_WIN_TIME

            # --- i-level draws (only at j == 0) ---
            rs, u_w = R.rs_rand01(rs, active=at_j0 & on)
            start_weight = u_w * F32(self.total_prob_weight)
            picked = jnp.argmax(start_weight - cum_w <= 0)
            typ_new = jnp.minimum(picked + 2, NUM_BASIC_OBJECTS - 1).astype(I32)
            typ = jnp.where(at_j0, typ_new, iv["typ"])
            is_flyer_t = (typ == FLYER) | (typ == FAST_FLYER)
            rs, gsz = R.rs_randint(rs, 0, 5, active=at_j0 & on & is_flyer_t)
            group_size = jnp.where(
                at_j0,
                jnp.where(is_flyer_t, gsz + 1, 1),
                iv["group_size"],
            )
            rs, fth_new = R.rs_randn(
                rs, NUM_SHIP_THEMES, active=at_j0 & on & is_flyer_t
            )
            fth = jnp.where(at_j0, fth_new, iv["fth"])
            r = jnp.asarray(self.hp_object_r)[typ]
            rs, yp_new = eo.rand_pos(rs, r, 0.0, 16.0, active=at_j0 & on)
            yp = jnp.where(at_j0, yp_new, iv["yp"])
            iv = {"typ": typ, "group_size": group_size, "fth": fth, "yp": yp}

            # --- j-level draws ---
            jon = on & (j < group_size)
            spawn_time = t + j * 5
            rs, ft = R.rs_randint(rs, 10, 100, active=jon)
            rs, u_th = R.rs_rand01(rs, active=jon)
            # float theta = (rand01() - .5) * k: the .5 literal promotes, one
            # narrowing into the float theta (starpilot.cpp:263)
            theta = fm.narrow(
                (fm.wide(cfg, u_th) - 0.5) * F32(2 * PI / 4)
            )
            v_scale = jnp.asarray(self.hp_vs)[typ]
            rs, z = R.rs_randint(rs, 0, 2, active=jon)
            theta = jnp.where(z == 1, 0.0, theta)
            health = jnp.asarray(self.hp_healths)[typ]
            slow = (typ == METEOR) | (typ == CLOUD)
            theta = jnp.where(slow | (typ == TURRET), 0.0, theta)
            v_scale = jnp.where(
                slow | (typ == TURRET), F32(self.hp_slow_v), v_scale
            )
            fire_time = jnp.where(slow, -1, ft)
            rs, tft = R.rs_randint(rs, 20, 30, active=jon & (typ == TURRET))
            fire_time = jnp.where(typ == TURRET, tft, fire_time)
            v_scale = v_scale * F32(V_SCALE)
            # vx/vy: the game TU's cos/sin are the C double functions; the
            # double chain narrows once at the float store
            # (starpilot.cpp:284-285)
            vx = fm.narrow(
                -1.0 * fm.dcos(cfg, theta) * fm.wide(cfg, v_scale)
            )
            vy = fm.narrow(fm.dsin(cfg, theta) * fm.wide(cfg, v_scale))

            flyer_j = jon & is_flyer_t
            rs, u_sr = R.rs_rand01(rs, active=flyer_j)
            spawn_right = ~(flyer_j & (u_sr > F32(0.9)) & self.can_spawn_left)
            x_pos = jnp.where(spawn_right, 16.0 + r, -r)
            vx = jnp.where(spawn_right, vx, -vx)

            rs, th_c = R.rs_randn(rs, 9, active=jon & (typ == CLOUD))
            rs, th_m = R.rs_randn(rs, 8, active=jon & (typ == METEOR))
            rs, th_t = R.rs_randn(rs, 2, active=jon & (typ == TURRET))
            theme = jnp.where(
                typ == CLOUD, th_c,
                jnp.where(typ == METEOR, th_m, jnp.where(typ == TURRET, th_t, fth)),
            )
            ry = jnp.where(typ == TURRET, fm.fdiv(cfg, r, jnp.asarray(self.turret_aspects)[th_t]), r)
            rot = jnp.where(
                is_flyer_t, jnp.where(vx > 0, -1.0, 1.0) * F32(PI / 2), 0.0
            )
            vals = {
                "x": x_pos, "y": yp, "vx": vx, "vy": vy, "rx": r, "ry": ry,
                "type": typ, "image_theme": theme,
                "render_z": jnp.where(jon & (typ == CLOUD), 1, 0),
                "fire_time": fire_time, "spawn_time": spawn_time,
                "health": health, "rotation": rot,
            }
            cand = {
                f: cand[f].at[k].set(jnp.asarray(vals[f], cand[f].dtype))
                for f in SPAWNER_FIELDS
            }
            on_v = on_v.at[k].set(jon)
            count = count + jon.astype(I32)

            # --- timeline advance (after the group, j == 4) ---
            rs, dt = R.rs_randint(rs, 10, 30, active=(j == 4) & on)
            t = t + jnp.where((j == 4) & on, dt, 0)
            return rs, t, count, cand, on_v, iv

        iv0 = {
            "typ": jnp.asarray(0, I32), "group_size": jnp.asarray(1, I32),
            "fth": jnp.asarray(0, I32), "yp": jnp.asarray(0.0, F32),
        }
        rs, t, count, cand, on_v, _ = jax.lax.fori_loop(
            0, C, body, (rs, t, count, cand, on_v0, iv0)
        )

        # compact candidates (active first, creation order preserved), then
        # sort by spawn_time descending.  The reference's std::sort
        # (starpilot.cpp:340) is UNSTABLE, and spawn_time ties are common
        # (t + j*5 collisions across groups), so parity mode reproduces
        # libstdc++'s introsort tie order exactly via a host callback
        # (utils/cppsort.py, oracle-verified); the fast path keeps the
        # behaviorally-equivalent stable argsort.
        sp_small = cand
        spawn_key = jnp.where(on_v, sp_small["spawn_time"], -1)
        if cfg.parity_mode:
            from procgen_tpu.utils.cppsort import std_sort_perm

            def host_perm(keys, on):
                import numpy as np

                keys = np.asarray(keys)
                on = np.asarray(on)
                flat_k = keys.reshape(-1, keys.shape[-1])
                flat_on = on.reshape(-1, on.shape[-1])
                out = np.empty_like(flat_k, dtype=np.int32)
                for b in range(flat_k.shape[0]):
                    act = np.nonzero(flat_on[b])[0]
                    perm = std_sort_perm(
                        [int(k) for k in flat_k[b][act]], lambda x, y: x > y
                    )
                    rest = np.setdiff1d(np.arange(flat_k.shape[1]), act)
                    out[b] = np.concatenate([act[perm], rest]).astype(np.int32)
                return out.reshape(keys.shape)

            order = jax.pure_callback(
                host_perm,
                jax.ShapeDtypeStruct(spawn_key.shape, jnp.int32),
                spawn_key, on_v, vmap_method="broadcast_all",
            )
        else:
            order = jnp.argsort(-spawn_key, stable=True)
        sp = {}
        pad = MAX_SPAWNERS - C
        for f in SPAWNER_FIELDS:
            v = sp_small[f][order]
            v = jnp.where(jnp.arange(C) < count, v, jnp.zeros_like(v))
            sp[f] = jnp.pad(v, (0, pad))

        rs, agent_theme = R.rs_randn(rs, 1)  # choose_random_theme (1 theme)
        state = state.replace(
            ents=eo.write_slot(
                state.ents, eo.AGENT, rotation=F32(PI / 2),
                image_theme=agent_theme,
            )
        )

        extra = dict(state.extra)
        for f in SPAWNER_FIELDS:
            extra[f"sp_{f}"] = sp[f]
        extra["sp_count"] = count
        return state.replace(extra=extra), rs

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)
        ents = state.ents
        E = ents.capacity
        extra = dict(state.extra)

        # enemy fire + deaths (starpilot.cpp:369-394), vectorized
        t = ents.type
        not_player = ents.alive & (t != O.PLAYER)
        ft = ents.fire_time
        dt_sp = state.cur_time - ents.spawn_time
        fire = not_player & (ft > 0) & jnp.where(
            t == TURRET, dt_sp % jnp.maximum(ft, 1) == 0, dt_sp == ft
        )
        b_vx = ents.x[eo.AGENT] - ents.x
        b_vy = ents.y[eo.AGENT] - ents.y
        btype = jnp.where(t == TURRET, BULLET3, BULLET2)
        # "hp_vs[t] * V_SCALE / sqrt(vx*vx + vy*vy)": f32 numerator divided
        # by the DOUBLE sqrt, narrowed on the float store (starpilot.cpp:383);
        # a zero norm divides to inf exactly as the reference would
        num = jnp.asarray(self.hp_vs)[
            jnp.clip(btype, 0, NUM_BASIC_OBJECTS - 1)
        ] * F32(V_SCALE)
        # "b_vx*b_vx + b_vy*b_vy" rounds each square separately before the
        # add (no FMA on ivybridge) -- the unpinned contraction was a 1-ulp
        # bullet-velocity divergence in the r5 1000-step sweep
        bvs = fm.narrow(
            fm.wide(cfg, num)
            / fm.dsqrt(cfg, fm.fadd32(cfg, b_vx * b_vx, b_vy * b_vy))
        )
        bfields = {
            k: jnp.broadcast_to(v, (E,))
            for k, v in eo.make_entity(0, 0, 0, 0, 0, 0, BULLET2).items()
        }
        brx = jnp.asarray(self.hp_bullet_r)[jnp.clip(t, 0, NUM_BASIC_OBJECTS - 1)]
        bvx_s = b_vx * bvs
        bvy_s = b_vy * bvs
        # face_direction(b_vx, b_vy, -1*PI/2) on the SCALED components
        # (starpilot.cpp:384-389); no-op guard keeps the ctor's 0 rotation
        brot = jnp.where(
            (bvx_s != 0) | (bvy_s != 0),
            fm.face_rotation(cfg, bvx_s, bvy_s, -float(np.float32(PI)) / 2),
            F32(0.0),
        )
        bfields = dict(
            bfields,
            x=ents.x, y=ents.y, vx=bvx_s, vy=bvy_s,
            rx=brx, ry=brx, type=btype, image_type=btype,
            rotation=brot,
        )
        ents = eo.append_entities_masked(ents, bfields, fire, descending=True)

        dead = (
            ents.alive & (ents.health <= 0) & _is_destructible(ents.type)
            & ~ents.will_erase & (ents.type != O.PLAYER)
        )
        n_dead = jnp.sum(dead.astype(I32))
        ents = ents.replace(will_erase=ents.will_erase | dead)
        efields = {
            k: jnp.broadcast_to(v, (E,))
            for k, v in eo.make_entity(0, 0, 0, 0, 0, 0, O.EXPLOSION).items()
        }
        efields = dict(
            efields, x=ents.x, y=ents.y, vx=ents.vx, vy=ents.vy,
            rx=0.5 * ents.rx, ry=0.5 * ents.rx,
        )
        ents = eo.append_entities_masked(ents, efields, dead, descending=True)
        reward = state.reward + n_dead.astype(F32) * F32(ENEMY_REWARD)
        state = state.replace(ents=ents, reward=reward)

        # release today's spawners (starpilot.cpp:396-399): the reference
        # pops every back entry with spawn_time <= cur_time off the
        # desc-sorted vector, so the serialized list SHRINKS as spawners
        # go live (r5 fix: sp_count now decrements; it used to stay fixed,
        # which kept released spawners in the state bytes)
        release = (
            (jnp.arange(MAX_SPAWNERS) < extra["sp_count"])
            & (extra["sp_spawn_time"] <= state.cur_time)
        )
        extra["sp_count"] = extra["sp_count"] - jnp.sum(release.astype(I32))
        rel_fields = {
            k: jnp.broadcast_to(v, (MAX_SPAWNERS,))
            for k, v in eo.make_entity(0, 0, 0, 0, 0, 0, FLYER).items()
        }
        for f in SPAWNER_FIELDS:
            rel_fields[f] = extra[f"sp_{f}"]
        rel_fields["image_type"] = extra["sp_type"]
        ents = _append_from_spawners(state.ents, rel_fields, release)
        state = state.replace(ents=ents)

        # player bullet (starpilot.cpp:401-416)
        firing = state.special_action != 0
        theta = jnp.where(state.special_action == 2, F32(PI), F32(0.0))
        v_scale = self.hp_vs[BULLET_PLAYER] * F32(V_SCALE)
        # "cos(theta) * v_scale" etc: double trig chains narrowed at the
        # float stores (starpilot.cpp:411-414)
        vx = fm.narrow(fm.dcos(cfg, theta) * fm.wide(cfg, v_scale))
        vy = fm.narrow(fm.dsin(cfg, theta) * fm.wide(cfg, v_scale))
        x_off = fm.narrow(
            fm.wide(cfg, state.ents.rx[eo.AGENT]) * fm.dcos(cfg, theta)
        )
        pb = eo.make_entity(
            state.ents.x[eo.AGENT] + x_off, state.ents.y[eo.AGENT], vx, vy,
            self.hp_bullet_r[O.PLAYER], self.hp_bullet_r[O.PLAYER],
            BULLET_PLAYER,
        )
        pb["collides_with_entities"] = jnp.asarray(True)
        # face_direction(vx, vy) then "rotation -= PI / 2" as a separate f32
        # subtract (starpilot.cpp:417-418); vx is never 0 here
        pb["rotation"] = fm.face_rotation(cfg, vx, vy) - F32(PI) / 2
        ents, _ = eo.append_entity(state.ents, pb, active=firing)
        state = state.replace(ents=ents)

        # finish line at t == 500 (starpilot.cpp:418-424)
        at_end = state.cur_time == SHOOTER_WIN_TIME
        mt, fin_theme = R.mt_randn(state.rng, 4, active=at_end)
        fin_ry = F32(8.0)
        fin_rx = fin_ry * jnp.asarray(self.finish_aspects)[fin_theme]  # match width=False
        fin = eo.make_entity(
            16.0 + fin_rx, 8.0, -F32(self.hp_slow_v) * F32(V_SCALE), 0.0,
            fin_rx, fin_ry, FINISH_LINE,
        )
        fin["image_theme"] = fin_theme
        ents, _ = eo.append_entity(state.ents, fin, active=at_end)
        return state.replace(ents=ents, rng=mt, extra=extra)

    def serialize_extra(self, w, s, i):
        # starpilot.cpp:427-435: the spawner list serializes as entities
        from procgen_tpu.utils.serialize import write_entity_defaults

        n = int(s["extra.sp_count"][i])
        w.write_int(n)
        for k in range(n):
            vals = {
                f: s[f"extra.sp_{f}"][i][k] for f in SPAWNER_FIELDS
            }
            vals["image_type"] = vals["type"]
            write_entity_defaults(w, vals)

    def deserialize_extra(self, r):
        from procgen_tpu.utils.serialize import read_entity_fields

        n = r.read_int()
        out = self.init_extra(None)
        out = {k: np.array(v) for k, v in out.items()}  # writable copies
        for k in range(n):
            vals = read_entity_fields(r)
            for f in SPAWNER_FIELDS:
                out[f"sp_{f}"][k] = vals[f]
        out["sp_count"] = n
        return out


def _append_from_spawners(ents, fields, mask):
    """Append released spawners; the reference pops from the back of the
    desc-sorted vector, i.e. highest array index first."""
    E = ents.capacity
    S = mask.shape[0]
    idx = jnp.arange(S)
    key = jnp.where(mask, S - 1 - idx, 2 * S)
    order = jnp.argsort(key)
    n = jnp.sum(mask.astype(I32))
    cnt = jnp.sum(ents.alive.astype(I32))
    k = jnp.arange(S)
    valid = (k < n) & (cnt + k < E)
    dest = jnp.where(valid, cnt + k, E)
    new = {}
    for name in ents.__dataclass_fields__:
        arr = getattr(ents, name)
        if name == "alive":
            new[name] = arr.at[dest].set(True)
            continue
        src_vals = jnp.asarray(fields[name], arr.dtype)[order]
        new[name] = arr.at[dest].set(src_vals)
    return ents.replace(**new)


register_game("starpilot")(StarPilot)
