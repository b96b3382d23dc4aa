"""CoinRun: the flagship platformer -- run right, dodge hazards, grab the
coin (reference: games/coinrun.cpp)."""

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

GOAL_REWARD = 10.0

GOAL = 1
SAW = 2
SAW2 = 3
ENEMY = 5
ENEMY1 = 6
ENEMY2 = 7
PLAYER_JUMP = 9
PLAYER_RIGHT1 = 12
PLAYER_RIGHT2 = 13
WALL_MID = 15
WALL_TOP = 16
LAVA_MID = 17
LAVA_TOP = 18
ENEMY_BARRIER = 19
CRATE = 20

GRAVITY = 0.2
MAX_JUMP = 1.5
AIR_CONTROL = 0.15

WALKING_ENEMIES = (
    "slimeBlock", "slimePurple", "slimeBlue", "slimeGreen", "mouse",
    "snail", "ladybug", "wormGreen", "wormPink",
)
PLAYER_THEME_COLORS = ("Beige", "Blue", "Green", "Pink", "Yellow")
GROUND_THEMES = ("Dirt", "Grass", "Planet", "Sand", "Snow", "Stone")


def _is_wall(t):
    return (t == WALL_MID) | (t == WALL_TOP)


class CoinRun(GameDef):
    name = "coinrun"
    visibility = 13.0
    mixrate = 0.2
    maxspeed = 0.5
    max_jump = MAX_JUMP
    out_of_bounds_object = WALL_MID
    background_group = "platform_backgrounds"
    world_w_max = 64
    world_h_max = 64
    agent_only_smart = False  # walking enemies are smart
    uses_entity_block = True
    uses_entity_push = True  # crate standing clamps via push_obj
    max_substeps = 8
    entity_rotations = "none"
    grid_theme_count = len(GROUND_THEMES)
    # worst case: ~40 enemies x 9-step trails + 30 crates + saws
    max_entities = 512
    max_smart_entities = 48  # agent + <= 40 walking enemies

    def __init__(self, cfg):
        self.easy = cfg.distribution_mode == DistributionMode.easy

    def use_block_asset(self, type_):
        # coinrun.cpp:183-185
        return type_ in (WALL_MID, WALL_TOP)

    def asset_map(self, cfg):
        # coinrun.cpp:74-124
        def players(stem):
            return [
                f"kenney/Players/128x256/{c}/alien{c}_{stem}.png"
                for c in PLAYER_THEME_COLORS
            ]

        return {
            O.PLAYER: players("stand"),
            PLAYER_JUMP: players("jump"),
            PLAYER_RIGHT1: players("walk1"),
            PLAYER_RIGHT2: players("walk2"),
            ENEMY1: [f"kenney/Enemies/{e}.png" for e in WALKING_ENEMIES],
            ENEMY2: [f"kenney/Enemies/{e}_move.png" for e in WALKING_ENEMIES],
            GOAL: ["kenney/Items/coinGold.png"],
            WALL_TOP: [
                f"kenney/Ground/{g}/{g.lower()}Mid.png" for g in GROUND_THEMES
            ],
            WALL_MID: [
                f"kenney/Ground/{g}/{g.lower()}Center.png" for g in GROUND_THEMES
            ],
            LAVA_TOP: ["kenney/Tiles/lavaTop_low.png"],
            LAVA_MID: ["kenney/Tiles/lava.png"],
            SAW: ["kenney/Enemies/sawHalf.png"],
            SAW2: ["kenney/Enemies/sawHalf_move.png"],
            CRATE: [
                "kenney/Tiles/boxCrate.png",
                "kenney/Tiles/boxCrate_double.png",
                "kenney/Tiles/boxCrate_single.png",
                "kenney/Tiles/boxCrate_warning.png",
            ],
            O.TRAIL: ["misc_assets/iconCircle_white.png"],
        }

    def image_rect_adjust(self, img_type):
        # players draw 128x256 sprites extending upward (coinrun.cpp:64-70)
        is_player = (
            (img_type == O.PLAYER) | (img_type == PLAYER_JUMP)
            | (img_type == PLAYER_RIGHT1) | (img_type == PLAYER_RIGHT2)
        )
        ox = jnp.where(is_player, F32(0.0), F32(0.0))
        oy = jnp.where(is_player, F32(-0.7415), F32(0.0))
        sw = jnp.where(is_player, F32(1.0), F32(1.0))
        sh = jnp.where(is_player, F32(1.7415), F32(1.0))
        return ox, oy, sw, sh

    def grid_themed_types(self):
        return (WALL_MID, WALL_TOP)

    def grid_theme_state(self, cfg, state):
        return state.extra["wall_theme"]

    def init_extra(self, cfg):
        return {
            "last_agent_y": jnp.asarray(0.0, F32),
            "wall_theme": jnp.asarray(0, I32),
            "has_support": jnp.asarray(False),
            "facing_right": jnp.asarray(True),
            "is_on_crate": jnp.asarray(False),
        }

    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        return state.replace(
            main_width=jnp.asarray(64, I32), main_height=jnp.asarray(64, I32)
        )

    def is_blocked(self, cfg, state, src_type, target_type, is_horizontal):
        base = GameDef.is_blocked(self, cfg, state, src_type, target_type, is_horizontal)
        return base | ((src_type == O.PLAYER) & _is_wall(target_type))

    def will_reflect(self, cfg, state, src_type, target_type):
        # coinrun.cpp:143-145
        return (src_type == ENEMY) & (
            _is_wall(target_type) | (target_type == ENEMY_BARRIER)
        )

    def is_blocked_ents_vals(self, cfg, state, src_type, tgt, is_horizontal):
        # crates standable from above only (coinrun.cpp:187-202); the
        # reference consults the *agent's* state regardless of src
        ents = state.ents
        is_crate = tgt["type"] == CRATE
        crate_block = (
            (ents.vy[eo.AGENT] < 0)
            & (state.action_vy >= 0)
            & (
                state.extra["last_agent_y"]
                >= tgt["y"] + tgt["ry"] + ents.ry[eo.AGENT]
            )
        )
        base = GameDef.is_blocked_ents_vals(
            self, cfg, state, src_type, tgt, is_horizontal
        )
        return jnp.where(is_crate, ~is_horizontal & crate_block, base)

    def note_entity_blocks(self, cfg, state, idxs, blocked_mat, is_horizontal):
        # coinrun.cpp:187-202 sets is_on_crate INSIDE is_blocked_ents, which
        # consults the AGENT's state but fires for ANY src entity whose
        # vertical probe overlaps a crate (the check never tests src) --
        # so do not mask to the agent's mover row; the vertical-only gate
        # is already inside is_blocked_ents_vals
        on_crate = jnp.any(
            blocked_mat & (state.ents.type == CRATE)[None, :]
        )
        extra = dict(state.extra)
        extra["is_on_crate"] = extra["is_on_crate"] | on_crate
        return state.replace(extra=extra)

    def handle_agent_collision(self, cfg, state: EnvState, mask) -> EnvState:
        # coinrun.cpp:126-134
        t = state.ents.type
        dead = jnp.any(mask & ((t == ENEMY) | (t == SAW)))
        return state.replace(done=state.done | dead)

    def handle_grid_collision(self, cfg, state, ent_idx, cell_type, cx, cy, valid):
        # coinrun.cpp:147-158
        is_player = state.ents.type[ent_idx] == O.PLAYER
        goal = valid & is_player & (cell_type == GOAL)
        lava = valid & is_player & (
            (cell_type == LAVA_MID) | (cell_type == LAVA_TOP)
        )
        return state.replace(
            reward=state.reward + jnp.where(goal, F32(GOAL_REWARD), 0.0),
            done=state.done | goal | lava,
            level_complete=state.level_complete | goal,
        )

    def update_agent_velocity(self, cfg, state: EnvState) -> EnvState:
        # coinrun.cpp:160-177
        ents = state.ents
        has_support = state.extra["has_support"]
        mixrate_x = jnp.where(
            has_support, state.mixrate, state.mixrate * F32(AIR_CONTROL)
        )
        # "(1 - mixrate_x) * vx + mixrate_x * maxspeed * action_vx" with
        # SEPARATE f32 roundings (coinrun.cpp:158, no FMA on ivybridge)
        vx = fm.fadd32(
            cfg,
            (1 - mixrate_x) * ents.vx[eo.AGENT],
            mixrate_x * state.maxspeed * state.action_vx,
        )
        vx = jnp.where(jnp.abs(vx) < mixrate_x * state.maxspeed, 0.0, vx)
        jumping = state.action_vy > 0
        vy = ents.vy[eo.AGENT]
        # "vy += .2 * action_vy": the double literal promotes the chain,
        # narrowed at the float store (coinrun.cpp:165)
        vy = jnp.where(
            jumping, state.max_jump,
            jnp.where(
                has_support, fm.dmuladd(cfg, state.action_vy, 0.2, vy), vy
            ),
        )
        apply_g = ~(has_support & jumping)
        vy = jnp.where(apply_g, vy - F32(GRAVITY), vy)
        vy = jnp.where(
            apply_g, jnp.clip(vy, -state.max_jump, state.max_jump), vy
        )
        return state.replace(ents=eo.write_slot(ents, eo.AGENT, vx=vx, vy=vy))

    def entity_image_override(self, cfg, state):
        # agent anim (coinrun.cpp:215-227); enemies/saws animate in game_step
        ents = state.ents
        has_support = state.extra["has_support"]
        vx = ents.vx[eo.AGENT]
        standing = (jnp.abs(vx) < 0.01) & (state.action_vx == 0) & has_support
        walk1 = (state.cur_time // 5 % 2 == 0) | ~has_support
        agent_img = jnp.where(
            standing, O.PLAYER, jnp.where(walk1, PLAYER_RIGHT1, PLAYER_RIGHT2)
        )
        return jnp.where(
            jnp.arange(ents.capacity) == eo.AGENT, agent_img, ents.image_type
        )

    def set_action_xy(self, cfg, state, move_action):
        # coinrun.cpp:448-473
        avx = (move_action // 3 - 1).astype(F32)
        avy = (move_action % 3 - 1).astype(F32)
        extra = dict(state.extra)
        extra["facing_right"] = jnp.where(
            avx > 0, True, jnp.where(avx < 0, False, extra["facing_right"])
        )
        ents = state.ents
        ax, ay = ents.x[eo.AGENT], ents.y[eo.AGENT]
        arx, ary = ents.rx[eo.AGENT], ents.ry[eo.AGENT]
        b1 = ph.get_obj_from_floats(state, ax - (arx - 0.01), ay - (ary + 0.01))
        b2 = ph.get_obj_from_floats(state, ax + (arx - 0.01), ay - (ary + 0.01))
        has_support = (
            extra["is_on_crate"] | _is_wall(b1) | _is_wall(b2)
        ) & (ents.vy[eo.AGENT] == 0)
        extra["has_support"] = has_support
        extra["is_on_crate"] = jnp.asarray(False)
        avy = jnp.where((avy == 1) & ~has_support, 0.0, avy)
        return avx, avy, F32(0.0), state.replace(extra=extra)

    def _create_enemy(self, state, rs, x, y, active):
        # coinrun.cpp:252-258; enemy theme via choose_random_theme
        rs, vs = R.rs_randn(rs, 2, active=active)
        rs, th = R.rs_randn(rs, len(WALKING_ENEMIES), active=active)
        fields = eo.make_entity(
            x.astype(F32) + 0.5, y.astype(F32) + 0.5,
            F32(0.15) * (vs * 2 - 1).astype(F32), 0.0, 0.5, 0.5, ENEMY,
        )
        fields["smart_step"] = jnp.asarray(True)
        fields["image_type"] = jnp.asarray(ENEMY1, I32)
        fields["render_z"] = jnp.asarray(1, I32)
        fields["image_theme"] = th
        ents, _ = eo.append_entity(state.ents, fields, active=active)
        return state.replace(ents=ents), rs

    def _fill(self, grid, x, y, dx, dy, v):
        xs = jnp.arange(64)[None, :]
        ys = jnp.arange(64)[:, None]
        m = (xs >= x) & (xs < x + dx) & (ys >= y) & (ys < y + dy)
        return jnp.where(m, v, grid)

    def _fill_block_top(self, grid, x, y, dx, dy, fill, top):
        grid = self._fill(grid, x, y, dx, dy - 1, fill)
        return self._fill(grid, x, y + dy - 1, dx, 1, top)

    def game_reset(self, cfg, state: EnvState, rs):
        state, rs = base_game_reset(self, cfg, state, rs)
        mw = mh = 64

        extra = dict(state.extra)
        if self.easy:
            # fixed themes (coinrun.cpp:424-427); background_index forced 0
            agent_theme = jnp.asarray(0, I32)
            wall_theme = jnp.asarray(0, I32)
            state = state.replace(background_index=jnp.asarray(0, I32))
        else:
            rs, agent_theme = R.rs_randn(rs, len(PLAYER_THEME_COLORS))
            rs, wall_theme = R.rs_randn(rs, len(GROUND_THEMES))

        state = state.replace(
            ents=eo.write_slot(
                state.ents, eo.AGENT, rx=F32(0.5), ry=F32(0.5787),
                x=F32(1.5), y=F32(np.float32(1) + np.float32(0.5787)), image_theme=agent_theme,
            )
        )
        extra["last_agent_y"] = F32(np.float32(1) + np.float32(0.5787))
        extra["is_on_crate"] = jnp.asarray(False)
        extra["has_support"] = jnp.asarray(False)
        extra["facing_right"] = jnp.asarray(True)
        extra["wall_theme"] = wall_theme

        grid = state.grid
        grid = self._fill(grid, 0, 0, mw, 1, WALL_TOP)
        grid = self._fill(grid, 0, 0, 1, mh, WALL_MID)
        grid = self._fill(grid, mw - 1, 0, 1, mh, WALL_MID)
        grid = self._fill(grid, 0, mh - 1, mw, 1, WALL_MID)
        state = state.replace(grid=grid)

        # generate_coin_to_the_right (coinrun.cpp:265-414)
        rs, dr = R.rs_randn(rs, 3)
        dif = dr + 1
        rs, ns = R.rs_randn(rs, dif)
        num_sections = ns + dif
        curr_x = jnp.asarray(5, I32)
        curr_y = jnp.asarray(1, I32)
        pit_threshold = dif
        rs, danger_type = R.rs_randn(rs, 3)
        max_dy = int(MAX_JUMP * MAX_JUMP / (2 * GRAVITY) - 0.5)
        max_dx = int(0.5 * 2 * MAX_JUMP / GRAVITY - 0.5)
        allow_monsters = not self.easy
        grid = state.grid

        MAX_SECTIONS = 5  # dif 3: randn(3) + 3
        for si in range(MAX_SECTIONS):
            fits = curr_x + 15 < mw
            on = (si < num_sections) & fits

            rs, dyr = R.rs_randn(rs, 4, active=on)
            dy = dyr + 1 + dif // 3
            dy = jnp.minimum(dy, max_dy)
            high = curr_y >= 20
            mid = on & ~high & (curr_y >= 5)
            rs, flip_r = R.rs_randn(rs, 2, active=mid)
            dy = jnp.where(high | (mid & (flip_r == 1)), -dy, dy)
            rs, dxr = R.rs_randn(rs, 2 * dif, active=on)
            dx = dxr + 3 + dif // 3
            curr_y = jnp.where(on, jnp.maximum(curr_y + dy, 1), curr_y)

            # && short-circuits: the randn(20) is only drawn when the
            # geometric preconditions hold (coinrun.cpp:323)
            pit_geo = on & (dx > 7) & (curr_y > 3)
            rs, pit_r = R.rs_randn(rs, 20, active=pit_geo)
            use_pit = pit_geo & (pit_r >= pit_threshold)

            # --- pit branch (coinrun.cpp:324-369) ---
            rs, x1r = R.rs_randn(rs, 3, active=use_pit)
            x1 = x1r + 1
            rs, x2r = R.rs_randn(rs, 3, active=use_pit)
            x2 = x2r + 1
            pit_width = dx - x1 - x2
            x2 = jnp.where(pit_width > max_dx, dx - x1 - max_dx, x2)
            pit_width = jnp.minimum(pit_width, max_dx)

            g2 = self._fill_block_top(grid, curr_x, 0, x1, curr_y, WALL_MID, WALL_TOP)
            g2 = self._fill_block_top(g2, curr_x + dx - x2, 0, x2, curr_y, WALL_MID, WALL_TOP)
            rs, lh_r = R.rs_randn(
                rs, jnp.maximum(curr_y - 3, 1), active=use_pit
            )
            lava_height = lh_r + 1
            g2 = jnp.where(
                (danger_type == 0),
                self._fill_block_top(
                    g2, curr_x + x1, 1, jnp.where(use_pit, pit_width, 0),
                    lava_height, LAVA_MID, LAVA_TOP,
                ),
                g2,
            )
            for ei in range(7):  # pit_width <= max_dx == 7
                e_on = use_pit & (ei < pit_width)
                saw_on = e_on & (danger_type == 1)
                sfields = eo.make_entity(
                    (curr_x + x1 + ei).astype(F32) + 0.5, F32(1.5), 0.0, 0.0,
                    0.5, 0.5, SAW,
                )
                ents, _ = eo.append_entity(state.ents, sfields, active=saw_on)
                state = state.replace(ents=ents)
                state, rs = self._create_enemy(
                    state, rs, curr_x + x1 + ei, jnp.asarray(1, I32),
                    e_on & (danger_type == 2),
                )

            wide = use_pit & (pit_width > 4)
            is5 = pit_width == 5
            is6 = pit_width == 6
            rs, a_r = R.rs_randn(rs, 2, active=wide)
            rs, b_r = R.rs_randn(rs, 2, active=wide)
            x3 = jnp.where(is5, 1 + a_r, 2 + a_r)
            w1 = jnp.where(
                is5 | is6, 1 + b_r, pit_width - x3 - (2 + b_r)
            )
            g3 = self._fill_block_top(
                g2, curr_x + x1 + x3, curr_y - 1, w1, 1, WALL_MID, WALL_TOP
            )
            g2 = jnp.where(wide, g3, g2)

            # --- platform branch (coinrun.cpp:370-400) ---
            g4 = self._fill_block_top(grid, curr_x, 0, dx, curr_y, WALL_MID, WALL_TOP)
            plat = on & ~use_pit
            rs, saw_roll = R.rs_randn(rs, 10, active=plat)
            place_saw = plat & (saw_roll < 2 * dif) & (dx > 3)
            rs, ox1 = R.rs_randn(rs, jnp.maximum(dx - 2, 1), active=place_saw)
            ob1_x = jnp.where(place_saw, curr_x + ox1 + 1, -1)
            sfields = eo.make_entity(
                ob1_x.astype(F32) + 0.5, curr_y.astype(F32) + 0.5, 0.0, 0.0,
                0.5, 0.5, SAW,
            )
            ents, _ = eo.append_entity(state.ents, sfields, active=place_saw)
            state = state.replace(ents=ents)

            rs, mon_roll = R.rs_randn(rs, 10, active=plat)
            place_mon = (
                plat & (mon_roll < dif) & (dx > 3) & (max_dx >= 4)
                & allow_monsters
            )
            rs, ox2 = R.rs_randn(rs, jnp.maximum(dx - 2, 1), active=place_mon)
            ob2_x = jnp.where(place_mon, curr_x + ox2 + 1, -1)
            state, rs = self._create_enemy(
                state, rs, ob2_x, curr_y, place_mon
            )

            for _ci in range(2):
                rs, cxr = R.rs_randn(rs, jnp.maximum(dx - 2, 1), active=plat)
                crate_x = curr_x + cxr + 1
                rs, c_roll = R.rs_randn(rs, 2, active=plat)
                place = (
                    plat & (c_roll == 1) & (ob1_x != crate_x)
                    & (ob2_x != crate_x)
                )
                rs, ph_r = R.rs_randn(rs, 3, active=place)
                pile_height = ph_r + 1
                for j in range(3):
                    c_on = place & (j < pile_height)
                    rs, cth = R.rs_randn(rs, 4, active=c_on)
                    cfields = eo.make_entity(
                        crate_x.astype(F32) + 0.5, (curr_y + j).astype(F32) + 0.5,
                        0.0, 0.0, 0.5, 0.5, CRATE,
                    )
                    cfields["image_theme"] = cth
                    ents, _ = eo.append_entity(state.ents, cfields, active=c_on)
                    state = state.replace(ents=ents)

            grid = jnp.where(use_pit, g2, jnp.where(plat, g4, grid))

            # enemy barriers (coinrun.cpp:402-408)
            bx = jnp.clip(curr_x - 1, 0, 63)
            by = jnp.clip(curr_y, 0, 63)
            put_b = on & ~_is_wall(grid[by, bx])
            grid = grid.at[by, bx].set(jnp.where(put_b, ENEMY_BARRIER, grid[by, bx]))
            curr_x = jnp.where(on, curr_x + dx, curr_x)
            bx2 = jnp.clip(curr_x, 0, 63)
            grid = grid.at[by, bx2].set(jnp.where(on, ENEMY_BARRIER, grid[by, bx2]))

        # goal cell + final columns (coinrun.cpp:410-414)
        gx = jnp.clip(curr_x, 0, 63)
        gy = jnp.clip(curr_y, 0, 63)
        grid = grid.at[gy, gx].set(GOAL)
        grid = self._fill_block_top(grid, curr_x, 0, 1, curr_y, WALL_MID, WALL_TOP)
        grid = self._fill(grid, curr_x + 1, 0, mw - curr_x - 1, mh, WALL_MID)

        return state.replace(grid=grid, extra=extra), rs

    def game_step(self, cfg, state: EnvState) -> EnvState:
        state = base_game_step(self, cfg, state)
        ents = state.ents

        refl = jnp.where(
            state.action_vx > 0, False,
            jnp.where(state.action_vx < 0, True, ents.is_reflected[eo.AGENT]),
        )
        ents = eo.write_slot(ents, eo.AGENT, is_reflected=refl)

        # enemy trails + animation, saw animation (coinrun.cpp:482-495)
        is_enemy = ents.alive & (ents.type == ENEMY)
        E = ents.capacity
        tfields = {
            k: jnp.broadcast_to(v, (E,))
            for k, v in eo.make_entity(0, 0, 0, 0, 0, 0, O.TRAIL).items()
        }
        tfields = dict(
            tfields,
            x=ents.x, y=ents.y - ents.ry * 0.5,
            vx=jnp.zeros((E,), F32), vy=jnp.full((E,), 0.01, F32),
            rx=jnp.full((E,), 0.3, F32), ry=jnp.full((E,), 0.2, F32),
            expire_time=jnp.full((E,), 8, I32),
            alpha=jnp.full((E,), 0.5, F32),
        )
        ents = eo.append_entities_masked(ents, tfields, is_enemy, descending=True)

        anim = jnp.where(state.cur_time // 5 % 2 == 0, ENEMY1, ENEMY2)
        image_type = jnp.where(is_enemy, anim, ents.image_type)
        is_saw = ents.alive & (ents.type == SAW)
        saw_anim = jnp.where(state.cur_time % 2 == 0, SAW, SAW2)
        image_type = jnp.where(is_saw, saw_anim, image_type)
        is_refl = jnp.where(is_enemy, ents.vx > 0, ents.is_reflected)
        ents = ents.replace(image_type=image_type, is_reflected=is_refl)

        extra = dict(state.extra)
        extra["last_agent_y"] = ents.y[eo.AGENT]
        return state.replace(ents=ents, extra=extra)

    def serialize_extra(self, w, s, i):
        # coinrun.cpp:500-519
        w.write_float(s["extra.last_agent_y"][i])
        w.write_int(int(s["extra.wall_theme"][i]))
        w.write_bool(bool(s["extra.has_support"][i]))
        w.write_bool(bool(s["extra.facing_right"][i]))
        w.write_bool(bool(s["extra.is_on_crate"][i]))
        w.write_float(GRAVITY)
        w.write_float(AIR_CONTROL)

    def deserialize_extra(self, r):
        out = {}
        out["last_agent_y"] = r.read_float()
        out["wall_theme"] = r.read_int()
        out["has_support"] = r.read_bool()
        out["facing_right"] = r.read_bool()
        out["is_on_crate"] = r.read_bool()
        r.read_float()
        r.read_float()
        return out


register_game("coinrun")(CoinRun)
