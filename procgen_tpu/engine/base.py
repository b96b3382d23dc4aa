"""GameDef: the per-game behavior contract, plus the BasicAbstractGame-level
step/reset bodies shared by all games.

A GameDef is the TPU-native equivalent of a ``BasicAbstractGame`` subclass:
static configuration (ctor constants) as class attributes, virtual methods as
pure per-env functions ``(cfg, state, ...) -> state``.  One program is
compiled per (game, config); there is no dynamic dispatch inside jit.

Ordering contract note: the reference's collision dispatch
(basic-abstract-game.cpp:719-741) interleaves agent/pair/grid handlers per
entity in reverse slot order.  The engine runs them as three vectorized
phases (all agent collisions, all pair collisions, grid collisions); this is
equivalent whenever handlers of different kinds don't observe each other's
side effects within one step, which holds for the currently ported games and
is re-audited per game.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from procgen_tpu import objects as O
from procgen_tpu import rng as R
from procgen_tpu.engine import entity_ops as eo
from procgen_tpu.engine import physics as ph
from procgen_tpu.state import (
    F32,
    I32,
    EnvState,
    default_entity_fields,
    empty_entity_table,
)

MAXVTHETA = F32(15 * 3.141592653589793 / 180)  # bag.cpp:6 (float const)
MIXRATEROT = F32(0.5)  # bag.cpp:7


class GameDef:
    """Base per-game definition with BasicAbstractGame defaults
    (ctor values: basic-abstract-game.cpp:22-46, game.cpp:25-37)."""

    name: str = "?"

    # Game-level constants
    timeout: int = 1000
    default_action: int = 4  # bag.cpp:38

    # Static capacities (compile-time shapes)
    world_w_max: int = 64
    world_h_max: int = 64
    max_entities: int = 16
    max_substeps: int = 12

    # Physics feature gates (trace only what the game can use)
    agent_only_smart: bool = True
    # entity types whose velocity zeroes when a grid probe blocks them
    # (ninja's sticking throwing stars, ninja.cpp:139-152)
    block_zeroes_velocity_types: tuple = ()
    # upper bound on simultaneously-alive smart_step entities; caps the
    # sequential sub-step sweeps for large tables (None = max_entities)
    max_smart_entities = None
    uses_entity_reflect: bool = False
    uses_entity_block: bool = False
    uses_entity_push: bool = False
    # True only when handle_grid_collision responds to non-player smart
    # entities (ninja's throwing stars); the reference dispatches for all
    # smart entities (bag.cpp:738-740) but every other game's handler is a
    # player-gated or default no-op there.
    smart_entities_grid_collide: bool = False
    uses_pair_collisions: bool = False

    # BasicAbstractGame ctor values
    char_dim: float = 5.0
    visibility: float = 16.0
    min_visibility: float = 0.0
    mixrate: float = 0.5
    maxspeed: float = 0.5
    max_jump: float = 0.5  # == maxspeed unless overridden
    random_agent_start: bool = True
    has_useful_vel_info: bool = True
    out_of_bounds_object: int = O.INVALID_OBJ
    bg_tile_ratio: float = 0.0

    # ---- rendering declarations ----
    background_group: str = "topdown_backgrounds"
    # "none": sprites never rotate; "axis": only multiples of 90 degrees
    # (fast separable path); "free": arbitrary angles (gather path)
    entity_rotations: str = "none"

    def image_rect_adjust(self, img_type):
        """get_adjusted_image_rect (bag.cpp:807-809): per-image-type dest
        rect adjustment as (ox, oy, sw, sh) fractions, or None."""
        return None

    def tile_ratio_for(self, img_type, rx=None, ry=None):
        """get_tile_aspect_ratio (bag.cpp:409-411) vectorized over image
        types; None when the game never tiles.  ``rx``/``ry`` carry the
        entity extents for games whose ratio depends on the entity shape
        (dodgeball's lava walls, dodgeball.cpp:249-255)."""
        return None

    @property
    def num_backgrounds(self) -> int:
        from procgen_tpu.render import assets

        return len(assets.BACKGROUND_GROUPS[self.background_group])

    def asset_map(self, cfg) -> dict:
        """type -> theme-ordered sprite paths (asset_for_type equivalent)."""
        return {}

    def should_preserve_type_themes(self, type_: int) -> bool:
        """Types whose themes survive restrict_themes (bag.cpp:446-453;
        overridden by heist/leaper/plunder)."""
        return False

    def use_block_asset(self, type_: int) -> bool:
        """Generated assets of this type paint as full-canvas blocks
        (bag.cpp:400-406; wall types override per game)."""
        return False

    def center_agent(self, cfg) -> bool:
        """Effective options.center_agent (games may force it per mode)."""
        return cfg.center_agent

    def grid_image_lut(self, cfg):
        from procgen_tpu.render import pack

        return pack.default_grid_image_lut()

    def grid_theme_lut(self, cfg):
        from procgen_tpu.render import pack

        return pack.default_grid_theme_lut()

    def grid_cell_types(self, cfg):
        """Cell types this game's grid can contain (narrows the v2 grid
        pass to K texture classes); None = auto-derive every type that has
        an asset (conservative but slower)."""
        return None

    def dynamic_bg_rect(self, cfg, states):
        """Batched parameters for dynamic_background games (starpilot):
        (x0, tile_w, w_total, y0, h) arrays of screen-px, for a horizontally
        tiled blit sampled from the cached bg mip."""
        raise NotImplementedError

    # ---- per-game state extras ----
    def init_extra(self, cfg) -> dict:
        return {}

    # ---- virtuals (bag.h:34-55) ----
    def choose_world_dim(self, cfg, state: EnvState) -> EnvState:
        return state

    # Worst-case RNG draws consumed by one reset (sizes the prefetch block;
    # overflow is detectable via rng.blk_overflowed and asserted in tests).
    reset_max_draws: int = 512

    def game_reset(self, cfg, state: EnvState, rs):
        """Level generation; draws through ``rs`` (an open MTBlock).
        Returns (state, rs)."""
        return base_game_reset(self, cfg, state, rs)

    def game_step(self, cfg, state: EnvState) -> EnvState:
        return base_game_step(self, cfg, state)

    def set_action_xy(self, cfg, state, move_action):
        """bag.cpp:658-662; returns (action_vx, action_vy, action_vrot)."""
        avx = (move_action // 3 - 1).astype(F32)
        avy = (move_action % 3 - 1).astype(F32)
        return avx, avy, F32(0.0)

    def update_agent_velocity(self, cfg, state: EnvState) -> EnvState:
        """bag.cpp:669-679 (+ decay_agent_velocity :681-684)."""
        from procgen_tpu.fmath import dmul, fadd32

        ents = state.ents
        v_scale = self.get_agent_acceleration_scale(cfg, state)
        mix = state.mixrate
        # "vx += mixrate * maxspeed * action_vx * v_scale": the add of the
        # product chain rounds separately (no FMA on ivybridge) -- the
        # unpinned contraction was the dodgeball/bossfight agent-position
        # 1-ulp in the r5 1000-step sweep
        vx = fadd32(
            cfg, (1 - mix) * ents.vx[eo.AGENT],
            mix * state.maxspeed * state.action_vx * v_scale,
        )
        vy = fadd32(
            cfg, (1 - mix) * ents.vy[eo.AGENT],
            mix * state.maxspeed * state.action_vy * v_scale,
        )
        vx = dmul(cfg, vx, 0.9)
        vy = dmul(cfg, vy, 0.9)
        return state.replace(ents=eo.write_slot(ents, eo.AGENT, vx=vx, vy=vy))

    def get_agent_acceleration_scale(self, cfg, state):
        return F32(1.0)

    def is_blocked(self, cfg, state, src_type, target_type, is_horizontal):
        """bag.cpp:485-492 (vectorized over target types)."""
        return jnp.logical_or(
            target_type == O.WALL_OBJ, target_type == state.out_of_bounds_object
        )

    def is_blocked_ents(self, cfg, state, src_type, target_type, is_horizontal):
        return self.is_blocked(cfg, state, src_type, target_type, is_horizontal)

    def is_blocked_ents_vals(self, cfg, state, src_type, tgt, is_horizontal):
        """is_blocked_ents against blocker field values ``tgt`` (dict with
        type/image_theme/y/ry arrays, broadcastable against ``src_type``);
        games whose blocking depends on more than the type (heist door
        themes, coinrun crates) override this.  Gather-free: callers pass
        whole-table or slot-sliced field arrays, never indexed reads."""
        return self.is_blocked_ents(
            cfg, state, src_type, tgt["type"], is_horizontal
        )

    def note_entity_blocks(self, cfg, state, idxs, blocked_mat, is_horizontal):
        """Observe which entities blocked the movers during a sub_step (the
        reference lets is_blocked_ents carry side effects, e.g. coinrun's
        is_on_crate, coinrun.cpp:187-202).  ``idxs`` (M,) mover slots,
        ``blocked_mat`` (M, E).  Default: no-op."""
        return state

    def entity_draw_mask(self, cfg, state):
        """should_draw_entity (bag.cpp:1048-1050) as a per-slot bool mask;
        None means draw all alive entities."""
        return None

    def entity_image_override(self, cfg, state):
        """Dynamic image_for_type for entities (e.g. chaser's enemy
        animation, chaser.cpp:97-109): per-slot image types or None."""
        return None

    # ---- dynamic grid theming (theme_for_grid_obj with game state, e.g.
    # climber's wall_theme, climber.cpp:101-106) ----
    grid_theme_count: int = 1  # number of per-env theme values

    def grid_themed_types(self):
        """Grid type ids whose theme is the per-env dynamic theme."""
        return ()

    def grid_theme_state(self, cfg, state):
        """Per-env theme scalar for the types in grid_themed_types, or None."""
        return None

    def grid_color_rect_lut(self, cfg):
        """draw_grid_obj color-rect overrides (e.g. chaser's orbs,
        chaser.cpp:111-117): None, or (dim_lut (T,), rgb_lut (T, 3)) numpy
        arrays over grid types; dim > 0 fills a centered sub-rect of that
        cell fraction with the color."""
        return None

    def hud_color_rects(self, cfg, state):
        """Post-entity screen-space fillRects (per-game game_draw overlays,
        e.g. plunder's juice/progress bars, plunder.cpp:66-77): None, or
        (rects (K, 4) [x, y_top, w, h] in world units scaled by ``unit``
        from the top-left -- get_abs_rect, bag.cpp:803-805 -- and colors
        (K, 3) RGB)."""
        return None

    def dynamic_background(self, cfg, state, out, SX, SY, pack):
        """Per-step custom background pass (starpilot's scrolling tile,
        starpilot.cpp:110-127).  Overriding this routes the game through the
        direct render path with this as the background."""
        return out

    def hud_overlay(self, cfg, state, out, SX, SY):
        """Free-form per-game screen-space overlay drawn after
        hud_color_rects (jumper's compass, jumper.cpp:137-177).  ``out`` is
        the f32 canvas, ``SX``/``SY`` pixel-center coordinate grids.
        Default: no-op."""
        return out

    def will_reflect(self, cfg, state, src_type, target_type):
        return jnp.zeros(
            jnp.broadcast_shapes(
                jnp.shape(src_type), jnp.shape(target_type)
            ),
            jnp.bool_,
        )

    def handle_agent_collision(self, cfg, state: EnvState, mask) -> EnvState:
        """mask: bool (E,) -- entities currently overlapping the agent."""
        return state

    def agent_collision_phase(self, cfg, state: EnvState) -> EnvState:
        """Agent-collision dispatch (bag.cpp:722-724).  Default: precompute
        the collision mask once and hand it to handle_agent_collision --
        exact whenever the handler doesn't mutate the agent's box mid-sweep.
        Games whose handlers do (e.g. bigfish growth) override this with a
        sequential reverse sweep."""
        ents = state.ents
        mask = eo.entity_vs_all(
            ents, ents.x[eo.AGENT], ents.y[eo.AGENT], ents.rx[eo.AGENT],
            ents.ry[eo.AGENT], margin=ents.collision_margin,
        )
        mask = mask & ents.alive & (ents.type != O.PLAYER)
        return self.handle_agent_collision(cfg, state, mask)

    def handle_collision_pairs(self, cfg, state: EnvState, pair_mask) -> EnvState:
        """pair_mask: bool (E, E); [i, j] == src i collided with target j."""
        return state

    def handle_grid_collision(self, cfg, state, ent_idx, cell_type, cx, cy, valid):
        return state

    def choose_center(self, cfg, state):
        """bag.cpp:664-667: view center (and possibly visibility, which some
        games overwrite here, e.g. fruitbot) when options.center_agent.
        Returns (cx, cy, visibility)."""
        return (
            state.ents.x[eo.AGENT],
            state.ents.y[eo.AGENT],
            state.visibility,
        )

    # ---- state codec hooks (per-game serialize extras, SURVEY 2.2 col 5) ----
    def serialize_extra(self, w, s, i) -> None:
        pass

    def deserialize_extra(self, r) -> dict:
        return {}


# ---------------------------------------------------------------------------
# BasicAbstractGame::game_reset (bag.cpp:758-797)
# ---------------------------------------------------------------------------


def base_game_reset(gd: GameDef, cfg, state: EnvState, rs):
    state = gd.choose_world_dim(cfg, state)

    rs, bg_pct_x = R.rs_rand01(rs)
    # Under use_generated_assets the reference paints ONE procgen background
    # per reset from the level rand_gen (bag.cpp:62-63, 769-773); here a
    # pregenerated pool is selected per level instead, so that mode's RNG
    # stream intentionally diverges from the reference (which cannot
    # serialize it anyway, bag.cpp:1176).
    from procgen_tpu.render.pack import PROCGEN_BG_POOL

    n_bgs = PROCGEN_BG_POOL if cfg.use_generated_assets else gd.num_backgrounds
    rs, background_index = R.rs_randn(rs, n_bgs)

    # entities.clear(); agent spawn (bag.cpp:775-793)
    a_r = F32(0.4)
    if gd.random_agent_start:
        from procgen_tpu import fmath as fm

        rs, u1 = R.rs_rand01(rs)
        rs, u2 = R.rs_rand01(rs)
        # "rand01() * (main_width - 2 * a_r) + a_r" with separate f32
        # roundings -- no FMA contraction (bag.cpp:781-782, ivybridge)
        ax = fm.fmuladd32(cfg, u1, state.main_width.astype(F32) - 2 * a_r, a_r)
        ay = fm.fmuladd32(cfg, u2, state.main_height.astype(F32) - 2 * a_r, a_r)
    else:
        ax = a_r
        ay = a_r

    ents = empty_entity_table(gd.max_entities)
    agent_fields = default_entity_fields(ax, ay, 0.0, 0.0, a_r, a_r, O.PLAYER)
    agent_fields["smart_step"] = jnp.asarray(True)
    agent_fields["render_z"] = jnp.asarray(1, I32)
    ents = eo.write_slot(ents, eo.AGENT, **agent_fields)

    H, W = state.grid.shape
    grid = jnp.full((H, W), O.SPACE, I32)

    return state.replace(
        bg_pct_x=bg_pct_x,
        background_index=background_index,
        ents=ents,
        grid=grid,
    ), rs


# ---------------------------------------------------------------------------
# BasicAbstractGame::game_step (bag.cpp:686-746)
# ---------------------------------------------------------------------------


def base_game_step(gd: GameDef, cfg, state: EnvState) -> EnvState:
    mt, sri = R.mt_randint(state.rng, 0, 1000000)
    action = state.action
    move = action % 9
    special = jnp.where(action >= 9, action - 8, 0)
    move = jnp.where(action >= 9, 4, move)
    last_move = jnp.where(move != 4, move, state.last_move_action)
    state = state.replace(
        rng=mt,
        step_rand_int=sri,
        move_action=move,
        special_action=special,
        last_move_action=last_move,
        action_vx=F32(0.0),
        action_vy=F32(0.0),
        action_vrot=F32(0.0),
    )
    res = gd.set_action_xy(cfg, state, move)
    if len(res) == 4:
        # games whose set_action_xy also mutates state (e.g. climber's
        # has_support probe, climber.cpp:267-289) return it as 4th element
        avx, avy, avrot, state = res
    else:
        avx, avy, avrot = res
    state = state.replace(action_vx=avx, action_vy=avy, action_vrot=avrot)

    # Agent velocity: grid path writes action velocities directly, continuous
    # path mixes (bag.cpp:707-715).  Only agent (vx, vy, vrot) differ, so
    # compute both and select scalars.
    cont_state = gd.update_agent_velocity(cfg, state)
    cont_vrot = (
        MIXRATEROT * state.ents.vrot[eo.AGENT] + MIXRATEROT * MAXVTHETA * avrot
    )
    gs = state.grid_step
    new_vx = jnp.where(gs, avx, cont_state.ents.vx[eo.AGENT])
    new_vy = jnp.where(gs, avy, cont_state.ents.vy[eo.AGENT])
    new_vrot = jnp.where(gs, state.ents.vrot[eo.AGENT], cont_vrot)
    # carry cont_state forward: update_agent_velocity overrides may have
    # side effects beyond vx/vy (ninja's jump_charge release ninja.cpp:112-115,
    # leaper's hop animation theme/rotation leaper.cpp:225-240); only the
    # grid-step games (maze/miner) skip update_agent_velocity in the
    # reference, and their default override is side-effect-free
    state = cont_state.replace(
        ents=eo.write_slot(
            cont_state.ents, eo.AGENT, vx=new_vx, vy=new_vy, vrot=new_vrot
        )
    )

    state = ph.step_entities(gd, cfg, state)

    # --- collision dispatch (bag.cpp:719-741), phased (see module note) ---
    state = gd.agent_collision_phase(cfg, state)

    if gd.uses_pair_collisions:
        ents = state.ents
        E = ents.capacity
        dx = jnp.abs(ents.x[:, None] - ents.x[None, :])
        dy = jnp.abs(ents.y[:, None] - ents.y[None, :])
        tx = ents.rx[:, None] + ents.rx[None, :] + ents.collision_margin[:, None]
        ty = ents.ry[:, None] + ents.ry[None, :] + ents.collision_margin[:, None]
        pair = (dx < tx) & (dy < ty)
        valid = (
            ents.collides_with_entities[:, None]
            & ents.alive[:, None]
            & ents.alive[None, :]
            & ~ents.will_erase[:, None]
            & ~ents.will_erase[None, :]
            & ~jnp.eye(E, dtype=bool)
        )
        state = gd.handle_collision_pairs(cfg, state, pair & valid)

    state = ph.check_grid_collisions(gd, cfg, state, eo.AGENT)
    if not gd.agent_only_smart and gd.smart_entities_grid_collide:
        # Other smart entities also receive grid collisions (bag.cpp:738-740).
        # Only games whose handler actually responds to non-player entities
        # run this loop (ninja's sticking stars); for every other game the
        # handler is a player-gated or default no-op, so the reference's
        # dispatch is behaviorally skippable.  The handler dispatch stays
        # sequential (handlers mutate grid/entities; reference order is
        # reverse slot order); ``active`` threads the validity instead of a
        # whole-state select.
        E = state.ents.capacity
        M = min(gd.max_smart_entities or E, E)
        slot = jnp.arange(E)
        smart_alive = (
            state.ents.alive & state.ents.smart_step & (slot != eo.AGENT)
        )
        order = jnp.argsort(jnp.where(smart_alive, E - 1 - slot, 2 * E))
        n_smart = jnp.sum(smart_alive.astype(I32))

        def body(k, st):
            return ph.check_grid_collisions(
                gd, cfg, st, order[k], active=k < n_smart
            )

        state = jax.lax.fori_loop(0, M, body, state)

    # erase + OOB (bag.cpp:743-745)
    state = state.replace(
        ents=eo.compact(state.ents, state.main_width, state.main_height)
    )
    ents = state.ents
    agent_oob = eo.is_out_of_bounds(
        ents.x[eo.AGENT], ents.y[eo.AGENT], ents.rx[eo.AGENT], ents.ry[eo.AGENT],
        state.main_width, state.main_height,
    )
    return state.replace(done=state.done | agent_oob)
