"""Heist: maze with colored keys/locked doors, gem goal (reference:
games/heist.cpp)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import fmath as fm
from procgen_tpu import objects as O
from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode
from procgen_tpu.engine import entity_ops as eo
from procgen_tpu.engine.base import GameDef, base_game_reset, base_game_step
from procgen_tpu.engine.levelgen import mazegen
from procgen_tpu.engine.rand_util import choose_nth_masked
from procgen_tpu.games import register_game
from procgen_tpu.render import assets
from procgen_tpu.state import F32, I32, EnvState

COMPLETION_BONUS = 10.0  # heist.cpp:10
LOCKED_DOOR = 1
KEY = 2
EXIT = 9
KEY_ON_RING = 11

KEY_ASSETS = (
    "misc_assets/keyBlue.png",
    "misc_assets/keyGreen.png",
    "misc_assets/keyRed.png",
)
EXIT_ASSET = "misc_assets/gemYellow.png"


class HeistGame(GameDef):
    name = "heist"
    has_useful_vel_info = False  # heist.cpp:27
    out_of_bounds_object = O.WALL_OBJ
    visibility = 8.0
    max_entities = 12  # <= 3 keys + 3 doors + exit + 3 ring keys + agent
    uses_entity_push = True  # locked doors block via push_obj
    entity_rotations = "free"  # face_direction uses 45-degree angles
    background_group = "topdown_backgrounds"  # heist.cpp:36-38
    reset_max_draws = 1024

    def __init__(self, cfg):
        mode = cfg.distribution_mode
        if mode == DistributionMode.easy:
            self.world_dim = 9
        elif mode == DistributionMode.hard:
            self.world_dim = 13
        elif mode == DistributionMode.memory:
            self.world_dim = 23
        else:
            raise ValueError(f"heist does not support mode {mode}")
        self.world_w_max = self.world_dim
        self.world_h_max = self.world_dim
        # heist.cpp:122: center_agent forced on only in memory mode
        self.force_center_agent = mode == DistributionMode.memory
        self.key_aspects = np.asarray(
            [assets.aspect_ratio(n) for n in KEY_ASSETS], F32
        )
        self.exit_aspect = np.float32(assets.aspect_ratio(EXIT_ASSET))

    def use_block_asset(self, type_):
        # heist.cpp:62-64
        return type_ in (O.WALL_OBJ, LOCKED_DOOR)

    def asset_map(self, cfg):
        # heist.cpp:44-60
        return {
            O.WALL_OBJ: ["kenney/Ground/Dirt/dirtCenter.png"],
            EXIT: [EXIT_ASSET],
            O.PLAYER: ["misc_assets/spaceAstronauts_008.png"],
            KEY: list(KEY_ASSETS),
            LOCKED_DOOR: [
                "misc_assets/lock_blue.png",
                "misc_assets/lock_green.png",
                "misc_assets/lock_red.png",
            ],
        }

    def should_preserve_type_themes(self, type_):
        # heist.cpp:40-42
        return type_ in (KEY, LOCKED_DOOR)

    def center_agent(self, cfg):
        return self.force_center_agent

    def init_extra(self, cfg):
        return {
            "num_keys": jnp.asarray(0, I32),
            "world_dim": jnp.asarray(self.world_dim, I32),
            "has_keys": jnp.zeros((3,), jnp.bool_),
        }

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        wd = jnp.asarray(self.world_dim, I32)
        # heist.cpp:99-113: world dims + maxspeed
        return state.replace(
            main_width=wd, main_height=wd, maxspeed=F32(0.75)
        )

    def is_blocked_ents_vals(self, cfg, state, src_type, tgt, is_horizontal):
        # heist.cpp:66-71: locked doors block until their key is held
        t = tgt["type"]
        theme = jnp.clip(tgt["image_theme"], 0, 2)
        # one-hot key lookup (gather-free; 3 key colors)
        has = jnp.zeros(jnp.broadcast_shapes(theme.shape), jnp.bool_)
        for c in range(3):
            has = jnp.where(theme == c, state.extra["has_keys"][c], has)
        door_blocks = jnp.logical_and(t == LOCKED_DOOR, ~has)
        base = jnp.logical_or(
            t == O.WALL_OBJ, t == state.out_of_bounds_object
        )
        return jnp.where(t == LOCKED_DOOR, door_blocks, base)

    def entity_draw_mask(self, cfg, state):
        # heist.cpp:73-78: ring keys appear once collected
        ents = state.ents
        theme = jnp.clip(ents.image_theme, 0, 2)
        ring = ents.type == KEY_ON_RING
        return jnp.where(ring, state.extra["has_keys"][theme], True)

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)

        wd = self.world_dim
        min_maze_dim = 5
        max_diff = (wd - min_maze_dim) // 2
        rs, difficulty = R.rs_randn(rs, max_diff + 1)

        if cfg.distribution_mode == DistributionMode.memory:
            rs, num_keys = R.rs_randn(rs, 4)
        else:
            rs, extra_k = R.rs_randn(rs, 2)
            num_keys = difficulty + extra_k
        num_keys = jnp.minimum(num_keys, 3)

        maze_dim = difficulty * 2 + min_maze_dim
        maze_scale = state.main_height.astype(F32) / F32(wd)  # == 1.0

        a_r = F32(0.375) * maze_scale
        ents = eo.write_slot(
            state.ents, eo.AGENT, rx=a_r, ry=a_r, x=F32(-1.0), y=F32(-1.0)
        )
        state = state.replace(ents=ents)

        rs, mgrid = mazegen.generate_maze_with_doors(rs, num_keys, maze_dim, wd)

        rs, off_x = R.rs_randn(rs, wd - maze_dim + 1)
        rs, off_y = R.rs_randn(rs, wd - maze_dim + 1)

        # world grid: WALL everywhere, SPACE at non-wall maze cells
        # (heist.cpp:156-170)
        ys = jnp.arange(wd)[:, None]
        xs = jnp.arange(wd)[None, :]
        mi = xs - off_x
        mj = ys - off_y
        inside = (mi >= 0) & (mi < maze_dim) & (mj >= 0) & (mj < maze_dim)
        mval_yx = mgrid[
            jnp.clip(mj + mazegen.MAZE_OFFSET, 0, wd + 1),
            jnp.clip(mi + mazegen.MAZE_OFFSET, 0, wd + 1),
        ]
        grid = jnp.where(
            inside & (mval_yx != O.WALL_OBJ), O.SPACE, O.WALL_OBJ
        ).astype(I32)
        state = state.replace(grid=grid)

        # entity spawn events in the reference's i(x)-major cell visitation
        # order (heist.cpp:160-190)
        k_lin = jnp.arange(wd * wd)
        ex = k_lin // wd  # maze x (outer loop)
        ey = k_lin % wd  # maze y (inner loop)
        valid = (ex < maze_dim) & (ey < maze_dim)
        mv = mgrid[
            jnp.clip(ey + mazegen.MAZE_OFFSET, 0, wd + 1),
            jnp.clip(ex + mazegen.MAZE_OFFSET, 0, wd + 1),
        ]
        is_key = valid & (mv >= O.KEY_OBJ)
        is_door = valid & (mv >= O.DOOR_OBJ) & (mv < O.KEY_OBJ)
        is_exit = valid & (mv == O.EXIT_OBJ)
        is_agent = valid & (mv == O.AGENT_OBJ)
        event = is_key | is_door | is_exit | is_agent
        n_events = jnp.sum(event.astype(I32))

        r_ent = maze_scale / 2
        spawn_r = F32(0.375) * maze_scale

        for k in range(8):  # <= 3 keys + 3 doors + exit + agent
            exists = k < n_events
            ei = choose_nth_masked(event, k)
            wx = (off_x + ex[ei]).astype(F32)
            wy = (off_y + ey[ei]).astype(F32)
            v = mv[ei]
            k_key = exists & is_key[ei]
            k_door = exists & is_door[ei]
            k_exit = exists & is_exit[ei]
            k_agent = exists & is_agent[ei]

            # agent placement (heist.cpp:187-189)
            state = state.replace(
                ents=eo.write_slot_masked(
                    state.ents, eo.AGENT, k_agent,
                    x=(wx + 0.5) * maze_scale, y=(wy + 0.5) * maze_scale,
                )
            )

            # keys/exit: spawn_entity within the cell box + match_aspect_ratio
            spawning = k_key | k_exit
            type_ = jnp.where(k_key, KEY, EXIT)
            fields = eo.make_entity(0.0, 0.0, 0.0, 0.0, spawn_r, spawn_r, type_)
            rs, px, py = eo.reposition(
                rs, state, spawn_r, spawn_r, type_,
                fields["collision_margin"],
                wx * maze_scale, wy * maze_scale, maze_scale, maze_scale,
                jnp.asarray(True), active=spawning,
            )
            theme = jnp.where(
                k_key, jnp.clip(mv[ei] - O.KEY_OBJ - 1, 0, 2), 0
            )
            aspect = jnp.where(
                k_key, jnp.asarray(self.key_aspects)[theme], self.exit_aspect
            )
            # door: add_entity at cell center (heist.cpp:178-180)
            fields["x"] = jnp.where(k_door, (wx + 0.5) * maze_scale, px)
            fields["y"] = jnp.where(k_door, (wy + 0.5) * maze_scale, py)
            fields["rx"] = jnp.where(k_door, r_ent, spawn_r)
            fields["ry"] = jnp.where(k_door, r_ent, fm.fdiv(cfg, spawn_r, aspect))
            fields["type"] = jnp.where(k_door, LOCKED_DOOR, type_)
            fields["image_type"] = fields["type"]
            fields["image_theme"] = jnp.where(
                k_door, jnp.clip(mv[ei] - O.DOOR_OBJ - 1, 0, 2), theme
            )
            ents, _ = eo.append_entity(
                state.ents, fields, active=spawning | k_door
            )
            state = state.replace(ents=ents)

        # HUD key ring (heist.cpp:192-202)
        ring_key_r = F32(0.03)
        for i in range(3):
            active = i < num_keys
            # "1 - ring_key_r * (2*i + 1.25)" is double math narrowed on the
            # ctor float param (heist.cpp:194); i is static, so fold on host
            rx = float(np.float32(0.03))
            fields = eo.make_entity(
                np.float32(1.0 - rx * (2 * i + 1.25)),
                np.float32(rx * 0.75),
                0.0, 0.0, ring_key_r, ring_key_r, KEY_ON_RING,
            )
            fields["image_theme"] = jnp.asarray(i, I32)
            fields["image_type"] = jnp.asarray(KEY, I32)
            fields["rotation"] = F32(math.pi / 2)
            fields["render_z"] = jnp.asarray(1, I32)
            fields["use_abs_coords"] = jnp.asarray(True)
            fields["ry"] = ring_key_r / self.key_aspects[i]
            ents, _ = eo.append_entity(state.ents, fields, active=active)
            state = state.replace(ents=ents)

        extra = dict(state.extra)
        extra["num_keys"] = num_keys
        extra["has_keys"] = jnp.zeros((3,), jnp.bool_)
        return state.replace(extra=extra), rs

    def agent_collision_phase(self, cfg, state: EnvState) -> EnvState:
        """Sequential reverse sweep (heist.cpp:80-96): a key collected at a
        higher slot unlocks doors processed later in the same sweep."""
        E = state.ents.capacity

        def body(k, carry):
            ents, has_keys, reward, done, complete = carry
            i = E - 1 - k
            coll = (
                (jnp.abs(ents.x[i] - ents.x[eo.AGENT])
                 < ents.rx[i] + ents.rx[eo.AGENT] + ents.collision_margin[i])
                & (jnp.abs(ents.y[i] - ents.y[eo.AGENT])
                   < ents.ry[i] + ents.ry[eo.AGENT] + ents.collision_margin[i])
            )
            hit = ents.alive[i] & coll & (i != eo.AGENT)
            t = ents.type[i]
            theme = jnp.clip(ents.image_theme[i], 0, 2)

            is_exit = hit & (t == EXIT)
            done = done | is_exit
            complete = complete | is_exit
            reward = jnp.where(is_exit, F32(COMPLETION_BONUS), reward)

            got_key = hit & (t == KEY)
            has_keys = has_keys.at[theme].set(has_keys[theme] | got_key)

            open_door = hit & (t == LOCKED_DOOR) & has_keys[theme]
            erase = got_key | open_door
            ents = ents.replace(
                will_erase=ents.will_erase.at[i].set(ents.will_erase[i] | erase)
            )
            return ents, has_keys, reward, done, complete

        ents, has_keys, reward, done, complete = jax.lax.fori_loop(
            0, E, body,
            (state.ents, state.extra["has_keys"], state.reward, state.done,
             state.level_complete),
        )
        extra = dict(state.extra)
        extra["has_keys"] = has_keys
        return state.replace(
            ents=ents, extra=extra, reward=reward, done=done,
            level_complete=complete,
        )

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)
        # face_direction (heist.cpp:206-209, entity.cpp:84-88)
        avx, avy = state.action_vx, state.action_vy
        moving = (avx != 0) | (avy != 0)
        rot = jnp.where(
            moving, fm.face_rotation(cfg, avx, avy), state.ents.rotation[eo.AGENT]
        )
        return state.replace(
            ents=eo.write_slot(state.ents, eo.AGENT, rotation=rot)
        )

    def serialize_extra(self, w, s, i):
        # heist.cpp:211-216
        nk = int(s["extra.num_keys"][i])
        w.write_int(nk)
        w.write_int(int(s["extra.world_dim"][i]))
        w.write_vector_bool(list(s["extra.has_keys"][i][:nk]))

    def deserialize_extra(self, r):
        nk = r.read_int()
        wd = r.read_int()
        hk = r.read_vector_bool()
        hk = (hk + [False] * 3)[:3]
        return {"num_keys": nk, "world_dim": wd, "has_keys": hk}


register_game("heist")(HeistGame)
