"""Env state as a pytree of arrays (structure-of-arrays design).

The reference keeps one heap ``Game`` object per env with an
``std::vector<shared_ptr<Entity>>`` (pointer-chasing, thread-pool stepped).
The TPU-native inversion: every scalar field of Game/BasicAbstractGame becomes
an array over envs, the entity list becomes a fixed-capacity SoA table with an
``alive`` mask, and the grid becomes a padded int32 tensor.  All engine code is
written per-env (scalar fields, ``(E,)`` entity axis, ``(H, W)`` grid) and
lifted over the env axis with ``jax.vmap`` inside one ``jit``.

Field inventory mirrors game.h:62-106, basic-abstract-game.h:114-163 and
entity.h:8-48 so that ``get_state`` byte-codec parity is possible.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from procgen_tpu import objects as O
from procgen_tpu.rng import MT

F32 = jnp.float32
I32 = jnp.int32
BOOL = jnp.bool_


@struct.dataclass
class EntityTable:
    """Fixed-capacity SoA entity table; per-env trailing axis ``(E,)``.

    Slot order is semantically the reference's vector order: slot 0 is always
    the agent (pushed first in game_reset, basic-abstract-game.cpp:788-792),
    spawns append at ``count``, erases compact stably.  ``alive`` marks
    occupied slots (slots >= count are dead).
    """

    x: jax.Array
    y: jax.Array
    vx: jax.Array
    vy: jax.Array
    rx: jax.Array
    ry: jax.Array
    type: jax.Array
    image_type: jax.Array
    image_theme: jax.Array
    render_z: jax.Array
    will_erase: jax.Array
    collides_with_entities: jax.Array
    collision_margin: jax.Array
    rotation: jax.Array
    vrot: jax.Array
    is_reflected: jax.Array
    fire_time: jax.Array
    spawn_time: jax.Array
    life_time: jax.Array
    expire_time: jax.Array
    use_abs_coords: jax.Array
    friction: jax.Array
    smart_step: jax.Array
    avoids_collisions: jax.Array
    auto_erase: jax.Array
    alpha: jax.Array
    health: jax.Array
    theta: jax.Array
    grow_rate: jax.Array
    alpha_decay: jax.Array
    climber_spawn_x: jax.Array
    alive: jax.Array

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]

    @property
    def count(self) -> jax.Array:
        return jnp.sum(self.alive.astype(I32), axis=-1)


# Fields and their dtypes, used by constructors and the serializer.
_ENTITY_FIELDS = {
    "x": F32, "y": F32, "vx": F32, "vy": F32, "rx": F32, "ry": F32,
    "type": I32, "image_type": I32, "image_theme": I32, "render_z": I32,
    "will_erase": BOOL, "collides_with_entities": BOOL,
    "collision_margin": F32, "rotation": F32, "vrot": F32,
    "is_reflected": BOOL, "fire_time": I32, "spawn_time": I32,
    "life_time": I32, "expire_time": I32, "use_abs_coords": BOOL,
    "friction": F32, "smart_step": BOOL, "avoids_collisions": BOOL,
    "auto_erase": BOOL, "alpha": F32, "health": F32, "theta": F32,
    "grow_rate": F32, "alpha_decay": F32, "climber_spawn_x": F32,
    "alive": BOOL,
}


def empty_entity_table(capacity: int) -> EntityTable:
    return EntityTable(
        **{
            name: jnp.zeros((capacity,), dtype)
            for name, dtype in _ENTITY_FIELDS.items()
        }
    )


def default_entity_fields(x, y, vx, vy, rx, ry, type_):
    """Constructor defaults from entity.cpp:8-51 as a dict of scalars.

    ``type_`` may be traced; the EXPLOSION/TRAIL specializations
    (entity.cpp:44-50) are applied with ``where``.
    """
    t = jnp.asarray(type_, I32)
    is_explosion = t == O.EXPLOSION
    is_trail = t == O.TRAIL
    return dict(
        x=jnp.asarray(x, F32), y=jnp.asarray(y, F32),
        vx=jnp.asarray(vx, F32), vy=jnp.asarray(vy, F32),
        rx=jnp.asarray(rx, F32), ry=jnp.asarray(ry, F32),
        type=t, image_type=t, image_theme=jnp.asarray(0, I32),
        render_z=jnp.asarray(0, I32),
        will_erase=jnp.asarray(False), collides_with_entities=jnp.asarray(False),
        collision_margin=jnp.asarray(0.0, F32), rotation=jnp.asarray(0.0, F32),
        vrot=jnp.asarray(0.0, F32), is_reflected=jnp.asarray(False),
        fire_time=jnp.asarray(-1, I32), spawn_time=jnp.asarray(-1, I32),
        life_time=jnp.asarray(0, I32),
        expire_time=jnp.where(is_explosion, 4, -1).astype(I32),
        use_abs_coords=jnp.asarray(False),
        friction=jnp.asarray(1.0, F32), smart_step=jnp.asarray(False),
        avoids_collisions=jnp.asarray(False), auto_erase=jnp.asarray(True),
        alpha=jnp.asarray(1.0, F32), health=jnp.asarray(1.0, F32),
        theta=jnp.asarray(-100.0, F32),
        grow_rate=jnp.where(
            is_explosion, F32(1.4), jnp.where(is_trail, F32(1.05), F32(1.0))
        ).astype(F32),
        alpha_decay=jnp.where(is_trail, F32(0.8), F32(1.0)).astype(F32),
        climber_spawn_x=jnp.asarray(0.0, F32),
        alive=jnp.asarray(True),
    )


@struct.dataclass
class EnvState:
    """Complete per-env state; every field per-env (vmap lifts over envs).

    Sections mirror Game (game.h:62-106) then BasicAbstractGame
    (basic-abstract-game.h:114-163); ``extra`` holds per-game fields (the
    serialize "extras" of each game, SURVEY.md section 2.2).
    """

    # --- RNG streams ---
    rng: MT
    level_seed_rng: MT
    asset_rng: MT

    # --- Game episode bookkeeping ---
    reward: jax.Array  # step_data.reward, f32
    done: jax.Array
    level_complete: jax.Array
    action: jax.Array
    timeout: jax.Array
    current_level_seed: jax.Array
    prev_level_seed: jax.Array
    episodes_remaining: jax.Array
    episode_done: jax.Array
    last_reward_timer: jax.Array
    last_reward: jax.Array
    cur_time: jax.Array
    grid_step: jax.Array

    # --- BasicAbstractGame world ---
    grid: jax.Array  # i32 (H_max, W_max), row-major [y, x] like Grid<int>
    main_width: jax.Array
    main_height: jax.Array
    out_of_bounds_object: jax.Array
    ents: EntityTable

    bg_pct_x: jax.Array
    background_index: jax.Array
    char_dim: jax.Array
    last_move_action: jax.Array
    move_action: jax.Array
    special_action: jax.Array
    mixrate: jax.Array
    maxspeed: jax.Array
    max_jump: jax.Array
    action_vx: jax.Array
    action_vy: jax.Array
    action_vrot: jax.Array
    center_x: jax.Array
    center_y: jax.Array
    step_rand_int: jax.Array

    # view parameters (written by prepare_for_drawing each observe;
    # serialized, so tracked in state)
    unit: jax.Array
    view_dim: jax.Array
    x_off: jax.Array
    y_off: jax.Array
    visibility: jax.Array
    min_visibility: jax.Array

    # --- render cache (not serialized; analogue of Game::render_buf) ---
    # Pre-rendered background+grid layer for the current level, refreshed on
    # reset by the env/fast wrappers.  Per-step frames composite entities
    # over it (render/renderer.py).  Invalid for center_agent games (view
    # moves every step); those use the direct render path.
    static_layer: jax.Array  # uint8 (64, 64, 3)

    # --- per-game extras ---
    extra: Dict[str, Any]


def init_state_template(gd, cfg) -> EnvState:
    """Fresh (pre-first-reset) single-env state with ctor defaults.

    gd: a GameDef (procgen_tpu.engine.base).  RNG streams are zero-seeded
    placeholders; the env wrapper seeds level_seed_rng per env
    (vecgame.cpp:309-314) before the first reset.
    """
    from procgen_tpu.rng import mt_seed  # local to avoid cycle

    zero = jnp.asarray(0, I32)
    return EnvState(
        rng=mt_seed(zero),
        level_seed_rng=mt_seed(zero),
        asset_rng=mt_seed(zero),
        reward=jnp.asarray(0.0, F32),
        done=jnp.asarray(True),  # step_data.done = true in ctor (game.cpp:36)
        level_complete=jnp.asarray(False),
        action=jnp.asarray(0, I32),
        timeout=jnp.asarray(gd.timeout, I32),
        current_level_seed=jnp.asarray(0, I32),
        prev_level_seed=jnp.asarray(0, I32),
        episodes_remaining=jnp.asarray(0, I32),
        episode_done=jnp.asarray(False),
        last_reward_timer=jnp.asarray(0, I32),
        last_reward=jnp.asarray(-1.0, F32),
        cur_time=jnp.asarray(0, I32),
        grid_step=jnp.asarray(False),
        grid=jnp.zeros((gd.world_h_max, gd.world_w_max), I32),
        main_width=zero,
        main_height=zero,
        out_of_bounds_object=jnp.asarray(gd.out_of_bounds_object, I32),
        ents=empty_entity_table(gd.max_entities),
        bg_pct_x=jnp.asarray(0.0, F32),
        background_index=zero,
        char_dim=jnp.asarray(gd.char_dim, F32),
        last_move_action=jnp.asarray(7, I32),
        move_action=zero,
        special_action=zero,
        mixrate=jnp.asarray(gd.mixrate, F32),
        maxspeed=jnp.asarray(gd.maxspeed, F32),
        max_jump=jnp.asarray(gd.max_jump, F32),
        action_vx=jnp.asarray(0.0, F32),
        action_vy=jnp.asarray(0.0, F32),
        action_vrot=jnp.asarray(0.0, F32),
        center_x=jnp.asarray(0.0, F32),
        center_y=jnp.asarray(0.0, F32),
        step_rand_int=zero,
        unit=jnp.asarray(0.0, F32),
        view_dim=jnp.asarray(0.0, F32),
        x_off=jnp.asarray(0.0, F32),
        y_off=jnp.asarray(0.0, F32),
        visibility=jnp.asarray(gd.visibility, F32),
        min_visibility=jnp.asarray(gd.min_visibility, F32),
        static_layer=jnp.zeros((64, 64, 3), jnp.uint8),
        extra=gd.init_extra(cfg),
    )


def tree_select(pred, a, b):
    """Per-env select between two batched pytrees (pred: bool[N])."""

    def sel(x, y):
        p = pred.reshape(pred.shape + (1,) * (x.ndim - pred.ndim))
        return jnp.where(p, x, y)

    return jax.tree_util.tree_map(sel, a, b)
