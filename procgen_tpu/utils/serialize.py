"""get_state/set_state: byte-compatible with the reference's buffer codec.

Layout follows Game::serialize (game.cpp:170-229), BasicAbstractGame::
serialize (bag.cpp:1169-1223) and Entity::serialize (entity.cpp:90-134),
using buffer.h primitives (little-endian 4-byte int/float, length-prefixed
strings, RandGen streams as libstdc++ ``operator<<`` text: 624 decimal words
plus the position, space-separated).  This makes state dumps diffable against
reference dumps and gives checkpoint/resume for free.

Host-side numpy code: state is pulled from device once per call; not a hot
path (checkpointing cadence).
"""

from __future__ import annotations

import struct
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import rng as R
from procgen_tpu.config import DistributionMode
from procgen_tpu.state import _ENTITY_FIELDS

SERIALIZE_VERSION = 0

# entity field order of entity.cpp:90-134 with buffer types
_ENTITY_LAYOUT = [
    ("x", "f"), ("y", "f"), ("vx", "f"), ("vy", "f"), ("rx", "f"), ("ry", "f"),
    ("type", "i"), ("image_type", "i"), ("image_theme", "i"), ("render_z", "i"),
    ("will_erase", "i"), ("collides_with_entities", "i"),
    ("collision_margin", "f"), ("rotation", "f"), ("vrot", "f"),
    ("is_reflected", "i"), ("fire_time", "i"), ("spawn_time", "i"),
    ("life_time", "i"), ("expire_time", "i"), ("use_abs_coords", "i"),
    ("friction", "f"), ("smart_step", "i"), ("avoids_collisions", "i"),
    ("auto_erase", "i"),
    ("alpha", "f"), ("health", "f"), ("theta", "f"), ("grow_rate", "f"),
    ("alpha_decay", "f"), ("climber_spawn_x", "f"),
]

# libstdc++ default-constructed mt19937 (seed 5489), used for the never-
# seeded asset_rand_gen so byte layout matches the reference.
_DEFAULT_MT = R.HostMT(5489)


class Writer:
    def __init__(self):
        self.parts: list[bytes] = []

    def write_int(self, v: int):
        self.parts.append(struct.pack("<i", int(np.int32(np.int64(v) & 0xFFFFFFFF))))

    def write_float(self, v):
        self.parts.append(struct.pack("<f", float(np.float32(v))))

    def write_bool(self, v):
        # buffer.h: bools travel as ints
        self.write_int(1 if v else 0)

    def write_string(self, s: str):
        b = s.encode()
        self.write_int(len(b))
        self.parts.append(b)

    def write_vector_bool(self, v):
        self.write_int(len(v))
        for x in v:
            self.write_int(1 if x else 0)

    def write_vector_int(self, v):
        self.write_int(len(v))
        for x in v:
            self.write_int(int(x))

    def write_vector_float(self, v):
        self.write_int(len(v))
        for x in v:
            self.write_float(x)

    def getvalue(self) -> bytes:
        return b"".join(self.parts)


class Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def read_int(self) -> int:
        v = struct.unpack_from("<i", self.data, self.off)[0]
        self.off += 4
        return v

    def read_float(self) -> float:
        v = struct.unpack_from("<f", self.data, self.off)[0]
        self.off += 4
        return np.float32(v)

    def read_string(self) -> str:
        n = self.read_int()
        s = self.data[self.off : self.off + n].decode()
        self.off += n
        return s

    def read_bool(self) -> bool:
        return self.read_int() > 0

    def read_vector_bool(self):
        return [self.read_int() > 0 for _ in range(self.read_int())]

    def read_vector_int(self):
        return [self.read_int() for _ in range(self.read_int())]

    def read_vector_float(self):
        return [self.read_float() for _ in range(self.read_int())]


_ENTITY_CTOR_DEFAULTS = {
    "vx": 0.0, "vy": 0.0, "image_theme": 0, "render_z": 0, "will_erase": 0,
    "collides_with_entities": 0, "collision_margin": 0.0, "rotation": 0.0,
    "vrot": 0.0, "is_reflected": 0, "fire_time": -1, "spawn_time": -1,
    "life_time": 0, "expire_time": -1, "use_abs_coords": 0, "friction": 1.0,
    "smart_step": 0, "avoids_collisions": 0, "auto_erase": 1, "alpha": 1.0,
    "health": 1.0, "theta": -100.0, "grow_rate": 1.0, "alpha_decay": 1.0,
    "climber_spawn_x": 0.0,
}


def write_entity_defaults(w: Writer, vals: dict) -> None:
    """Entity::serialize byte layout from a partial field dict (missing
    fields take the ctor defaults); used for starpilot's spawner list."""
    for name, t in _ENTITY_LAYOUT:
        v = vals.get(name, _ENTITY_CTOR_DEFAULTS.get(name, 0))
        if t == "f":
            w.write_float(float(v))
        else:
            w.write_int(int(v))


def read_entity_fields(r: Reader) -> dict:
    """Inverse of one Entity::serialize record."""
    out = {}
    for name, t in _ENTITY_LAYOUT:
        out[name] = r.read_float() if t == "f" else r.read_int()
    return out


def _write_randgen(w: Writer, key: np.ndarray, pos: int, seeded: bool = True):
    """RandGen::serialize (randgen.cpp:100-106)."""
    w.write_int(1 if seeded else 0)
    words = " ".join(str(int(x)) for x in np.asarray(key, np.uint32))
    w.write_string(words + " " + str(int(pos)))


def _read_randgen(r: Reader):
    seeded = r.read_int()
    toks = r.read_string().split()
    key = np.asarray([int(t) for t in toks[:624]], np.uint32)
    pos = int(toks[624])
    return key, pos, bool(seeded)


def serialize_env(gd, cfg, s, i: int) -> bytes:
    """One env's state (host-side numpy view ``s``) -> reference bytes."""
    w = Writer()
    w.write_int(SERIALIZE_VERSION)
    w.write_string(gd.name)

    # options (game.cpp:175-187)
    w.write_int(int(cfg.paint_vel_info))
    w.write_int(0)  # use_generated_assets (unsupported)
    w.write_int(int(cfg.use_monochrome_assets))
    w.write_int(int(cfg.restrict_themes))
    w.write_int(int(cfg.use_backgrounds))
    # games overwrite options.center_agent in game_reset (e.g. maze.cpp:66,
    # chaser.cpp:166); the serialized value is the game-effective one
    w.write_int(int(gd.center_agent(cfg)))
    w.write_int(0)  # debug_mode
    w.write_int(int(cfg.distribution_mode))
    w.write_int(int(cfg.use_sequential_levels))
    w.write_int(0)  # use_easy_jump
    w.write_int(0)  # plain_assets
    w.write_int(0)  # physics_mode

    w.write_int(int(s["grid_step"][i]))
    w.write_int(cfg.level_seed_low)
    w.write_int(cfg.level_seed_high)
    w.write_int(0)  # game_type
    w.write_int(i)  # game_n

    _write_randgen(w, s["level_seed_rng.key"][i], s["level_seed_rng.pos"][i])
    _write_randgen(w, s["rng.key"][i], s["rng.pos"][i])

    w.write_float(s["reward"][i])
    w.write_int(int(s["done"][i]))
    w.write_int(int(s["level_complete"][i]))
    w.write_int(int(s["action"][i]))
    w.write_int(int(s["timeout"][i]))
    w.write_int(int(s["current_level_seed"][i]))
    w.write_int(int(s["prev_level_seed"][i]))
    w.write_int(int(s["episodes_remaining"][i]))
    w.write_int(int(s["episode_done"][i]))
    w.write_int(int(s["last_reward_timer"][i]))
    w.write_float(s["last_reward"][i])
    w.write_int(gd.default_action)
    w.write_int(cfg.fixed_asset_seed)
    w.write_int(int(s["cur_time"][i]))
    w.write_int(0)  # is_waiting_for_step

    # BasicAbstractGame (bag.cpp:1169-1223)
    mw = int(s["main_width"][i])
    mh = int(s["main_height"][i])
    w.write_int(mw * mh)  # grid_size

    alive = s["ents.alive"][i]
    count = int(alive.sum())
    w.write_int(count)
    for k in range(count):
        for name, t in _ENTITY_LAYOUT:
            v = s[f"ents.{name}"][i][k]
            if t == "f":
                w.write_float(v)
            else:
                w.write_int(int(v))

    w.write_int(0)  # use_procgen_background
    w.write_int(int(s["background_index"][i]))
    w.write_float(gd.bg_tile_ratio)
    w.write_float(s["bg_pct_x"][i])
    w.write_float(s["char_dim"][i])
    w.write_int(int(s["last_move_action"][i]))
    w.write_int(int(s["move_action"][i]))
    w.write_int(int(s["special_action"][i]))
    w.write_float(s["mixrate"][i])
    w.write_float(s["maxspeed"][i])
    w.write_float(s["max_jump"][i])
    w.write_float(s["action_vx"][i])
    w.write_float(s["action_vy"][i])
    w.write_float(s["action_vrot"][i])
    w.write_float(s["center_x"][i])
    w.write_float(s["center_y"][i])
    w.write_int(int(gd.random_agent_start))
    w.write_int(int(gd.has_useful_vel_info))
    w.write_int(int(s["step_rand_int"][i]))
    _write_randgen(w, _DEFAULT_MT.mt, _DEFAULT_MT.pos, seeded=False)
    w.write_int(mw)
    w.write_int(mh)
    w.write_int(int(s["out_of_bounds_object"][i]))
    w.write_float(s["unit"][i])
    w.write_float(s["view_dim"][i])
    w.write_float(s["x_off"][i])
    w.write_float(s["y_off"][i])
    w.write_float(s["visibility"][i])
    w.write_float(s["min_visibility"][i])

    # grid (grid.h:69-73): w, h, then row-major data cropped to actual dims
    w.write_int(mw)
    w.write_int(mh)
    grid = s["grid"][i][:mh, :mw]
    w.write_vector_int(grid.reshape(-1).tolist())

    gd.serialize_extra(w, s, i)
    return w.getvalue()


def state_to_host(state) -> dict:
    """Flatten a batched EnvState into named numpy arrays (one transfer).

    The whole pytree is pulled with a single ``jax.device_get`` -- per-leaf
    ``np.asarray`` costs one device round-trip each (~80 RTTs), which
    dominates wall time on remote-device backends."""
    state = jax.device_get(state)
    flat = {}
    flat["rng.key"] = np.asarray(state.rng.key)
    flat["rng.pos"] = np.asarray(state.rng.pos)
    flat["level_seed_rng.key"] = np.asarray(state.level_seed_rng.key)
    flat["level_seed_rng.pos"] = np.asarray(state.level_seed_rng.pos)
    for f in (
        "reward", "done", "level_complete", "action", "timeout",
        "current_level_seed", "prev_level_seed", "episodes_remaining",
        "episode_done", "last_reward_timer", "last_reward", "cur_time",
        "grid_step", "grid", "main_width", "main_height",
        "out_of_bounds_object", "bg_pct_x", "background_index", "char_dim",
        "last_move_action", "move_action", "special_action", "mixrate",
        "maxspeed", "max_jump", "action_vx", "action_vy", "action_vrot",
        "center_x", "center_y", "step_rand_int", "unit", "view_dim",
        "x_off", "y_off", "visibility", "min_visibility",
    ):
        flat[f] = np.asarray(getattr(state, f))
    for name in _ENTITY_FIELDS:
        flat[f"ents.{name}"] = np.asarray(getattr(state.ents, name))
    for k, v in state.extra.items():
        flat[f"extra.{k}"] = np.asarray(v)
    return flat


def get_state(gd, cfg, state) -> List[bytes]:
    if cfg.use_generated_assets:
        # bag.cpp:1176: the reference fasserts generated assets off for
        # state serialization (asset RNG state is not captured)
        raise RuntimeError("get_state requires use_generated_assets=False")
    s = state_to_host(state)
    n = s["reward"].shape[0]
    return [serialize_env(gd, cfg, s, i) for i in range(n)]


def deserialize_env(gd, cfg, r: Reader, capacity: int, gw: int, gh: int):
    """Parse one env's bytes -> dict of scalar/array values."""
    out = {}
    assert r.read_int() == SERIALIZE_VERSION
    name = r.read_string()
    assert name == gd.name, (name, gd.name)
    for _ in range(12):
        r.read_int()  # options (taken from cfg)
    out["grid_step"] = r.read_int() > 0
    r.read_int()  # level_seed_low
    r.read_int()  # level_seed_high
    r.read_int()  # game_type
    r.read_int()  # game_n
    lk, lp, _ = _read_randgen(r)
    out["level_seed_rng.key"], out["level_seed_rng.pos"] = lk, lp
    rk, rp, _ = _read_randgen(r)
    out["rng.key"], out["rng.pos"] = rk, rp
    out["reward"] = r.read_float()
    out["done"] = r.read_int() > 0
    out["level_complete"] = r.read_int() > 0
    out["action"] = r.read_int()
    out["timeout"] = r.read_int()
    out["current_level_seed"] = r.read_int()
    out["prev_level_seed"] = r.read_int()
    out["episodes_remaining"] = r.read_int()
    out["episode_done"] = r.read_int() > 0
    out["last_reward_timer"] = r.read_int()
    out["last_reward"] = r.read_float()
    r.read_int()  # default_action
    r.read_int()  # fixed_asset_seed
    out["cur_time"] = r.read_int()
    r.read_int()  # is_waiting_for_step

    r.read_int()  # grid_size
    count = r.read_int()
    assert count <= capacity, (count, capacity)
    ents = {
        name: np.zeros((capacity,), np.float32 if t == "f" else np.int32)
        for name, t in _ENTITY_LAYOUT
    }
    for k in range(count):
        for name, t in _ENTITY_LAYOUT:
            ents[name][k] = r.read_float() if t == "f" else r.read_int()
    out["ents"] = ents
    out["ents.count"] = count

    r.read_int()  # use_procgen_background
    out["background_index"] = r.read_int()
    r.read_float()  # bg_tile_ratio
    out["bg_pct_x"] = r.read_float()
    out["char_dim"] = r.read_float()
    out["last_move_action"] = r.read_int()
    out["move_action"] = r.read_int()
    out["special_action"] = r.read_int()
    out["mixrate"] = r.read_float()
    out["maxspeed"] = r.read_float()
    out["max_jump"] = r.read_float()
    out["action_vx"] = r.read_float()
    out["action_vy"] = r.read_float()
    out["action_vrot"] = r.read_float()
    out["center_x"] = r.read_float()
    out["center_y"] = r.read_float()
    r.read_int()  # random_agent_start
    r.read_int()  # has_useful_vel_info
    out["step_rand_int"] = r.read_int()
    _read_randgen(r)  # asset_rand_gen
    out["main_width"] = r.read_int()
    out["main_height"] = r.read_int()
    out["out_of_bounds_object"] = r.read_int()
    out["unit"] = r.read_float()
    out["view_dim"] = r.read_float()
    out["x_off"] = r.read_float()
    out["y_off"] = r.read_float()
    out["visibility"] = r.read_float()
    out["min_visibility"] = r.read_float()

    w_ = r.read_int()
    h_ = r.read_int()
    data = r.read_vector_int()
    grid = np.zeros((gh, gw), np.int32)
    grid[:h_, :w_] = np.asarray(data, np.int32).reshape(h_, w_)
    out["grid"] = grid

    out["extra"] = gd.deserialize_extra(r)
    return out


def set_state(gd, cfg, state, blobs: List[bytes]):
    """Build a new batched EnvState from per-env byte strings, using
    ``state`` for shapes/non-serialized fields (e.g. static_layer, which the
    caller must re-render, mirroring the re-observe in vecgame.cpp:455)."""
    n = len(blobs)
    capacity = state.ents.capacity
    gh, gw = state.grid.shape[1], state.grid.shape[2]
    parsed = [
        deserialize_env(gd, cfg, Reader(b), capacity, gw, gh) for b in blobs
    ]

    def stack(key, dtype):
        return jnp.asarray(np.stack([p[key] for p in parsed]), dtype)

    ents_fields = {}
    for name, t in _ENTITY_LAYOUT:
        arr = np.stack([p["ents"][name] for p in parsed])
        ents_fields[name] = jnp.asarray(arr, _ENTITY_FIELDS[name])
    counts = np.asarray([p["ents.count"] for p in parsed])
    alive = np.arange(capacity)[None, :] < counts[:, None]
    ents = state.ents.replace(alive=jnp.asarray(alive), **ents_fields)

    extra = dict(state.extra)
    for k in extra:
        vals = [p["extra"].get(k) for p in parsed]
        if all(v is not None for v in vals):
            extra[k] = jnp.asarray(np.stack(vals), state.extra[k].dtype)

    return state.replace(
        rng=R.MT(
            key=stack("rng.key", jnp.uint32), pos=stack("rng.pos", jnp.int32)
        ),
        level_seed_rng=R.MT(
            key=stack("level_seed_rng.key", jnp.uint32),
            pos=stack("level_seed_rng.pos", jnp.int32),
        ),
        reward=stack("reward", jnp.float32),
        done=stack("done", jnp.bool_),
        level_complete=stack("level_complete", jnp.bool_),
        action=stack("action", jnp.int32),
        timeout=stack("timeout", jnp.int32),
        current_level_seed=stack("current_level_seed", jnp.int32),
        prev_level_seed=stack("prev_level_seed", jnp.int32),
        episodes_remaining=stack("episodes_remaining", jnp.int32),
        episode_done=stack("episode_done", jnp.bool_),
        last_reward_timer=stack("last_reward_timer", jnp.int32),
        last_reward=stack("last_reward", jnp.float32),
        cur_time=stack("cur_time", jnp.int32),
        grid_step=stack("grid_step", jnp.bool_),
        grid=stack("grid", jnp.int32),
        main_width=stack("main_width", jnp.int32),
        main_height=stack("main_height", jnp.int32),
        out_of_bounds_object=stack("out_of_bounds_object", jnp.int32),
        ents=ents,
        bg_pct_x=stack("bg_pct_x", jnp.float32),
        background_index=stack("background_index", jnp.int32),
        char_dim=stack("char_dim", jnp.float32),
        last_move_action=stack("last_move_action", jnp.int32),
        move_action=stack("move_action", jnp.int32),
        special_action=stack("special_action", jnp.int32),
        mixrate=stack("mixrate", jnp.float32),
        maxspeed=stack("maxspeed", jnp.float32),
        max_jump=stack("max_jump", jnp.float32),
        action_vx=stack("action_vx", jnp.float32),
        action_vy=stack("action_vy", jnp.float32),
        action_vrot=stack("action_vrot", jnp.float32),
        center_x=stack("center_x", jnp.float32),
        center_y=stack("center_y", jnp.float32),
        step_rand_int=stack("step_rand_int", jnp.int32),
        unit=stack("unit", jnp.float32),
        view_dim=stack("view_dim", jnp.float32),
        x_off=stack("x_off", jnp.float32),
        y_off=stack("y_off", jnp.float32),
        visibility=stack("visibility", jnp.float32),
        min_visibility=stack("min_visibility", jnp.float32),
        extra=extra,
    )
