"""Per-env operations on the SoA entity table.

Exact behavioral counterparts of the entity helpers in
basic-abstract-game.cpp (spawn/reposition/collision/erase) re-expressed as
masked vector ops over the fixed ``(E,)`` slot axis.  All functions here are
single-env (lifted with vmap by the engine); `state` is an EnvState.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from procgen_tpu import objects as O
from procgen_tpu import rng as R
from procgen_tpu.state import F32, I32, EntityTable, EnvState, default_entity_fields

AGENT = 0  # agent is always slot 0 (basic-abstract-game.cpp:788-792)


def read_field(ents: EntityTable, name: str, i):
    return getattr(ents, name)[i]


def read_slot(ents: EntityTable, i) -> dict:
    return {name: getattr(ents, name)[i] for name in ents.__dataclass_fields__}


def write_slot(ents: EntityTable, i, **updates) -> EntityTable:
    new = {}
    for name, val in updates.items():
        arr = getattr(ents, name)
        new[name] = arr.at[i].set(jnp.asarray(val, arr.dtype))
    return ents.replace(**new)


def write_slot_masked(ents: EntityTable, i, mask, **updates) -> EntityTable:
    """Write fields at slot i only where ``mask`` (scalar bool) holds."""
    new = {}
    for name, val in updates.items():
        arr = getattr(ents, name)
        val = jnp.asarray(val, arr.dtype)
        new[name] = arr.at[i].set(jnp.where(mask, val, arr[i]))
    return ents.replace(**new)


def _field_names(ents: EntityTable):
    return list(ents.__dataclass_fields__)


def pack_table(ents: EntityTable):
    """All fields as one (E, F) float32 matrix, so whole-table permutations
    cost ONE gather/scatter instead of ~31 (TPU gathers pay per row: a
    permuted read of 31 separate (E,) fields is 31x the rows of one packed
    read).  Exact: every integer entity field is < 2^24 (types <= 1103,
    themes <= 9, frame counters bounded by the 6000-step max timeout), so
    f32 round-trips losslessly; bools map to 0/1."""
    names = _field_names(ents)
    cols = [getattr(ents, n).astype(jnp.float32) for n in names]
    return jnp.stack(cols, axis=-1), names


def unpack_table(ents: EntityTable, packed, names) -> EntityTable:
    new = {}
    for j, n in enumerate(names):
        arr = getattr(ents, n)
        v = packed[..., j]
        new[n] = v > 0.5 if arr.dtype == jnp.bool_ else v.astype(arr.dtype)
    return ents.replace(**new)


def slots_onehot(capacity: int, idxs):
    """(M, E) one-hot of slot indices (gather-free slot access: TPU gathers
    run element-at-a-time, one-hot dots ride the MXU)."""
    return idxs[:, None] == jnp.arange(capacity)[None, :]


def read_slots(ents: EntityTable, idxs, names):
    """Fields of slots ``idxs`` (M,) as {name: (M,)} via one-hot selects.

    BIT-exact: floats move as their i32 bit patterns (masked select + integer
    sum, exactly one nonzero lane), so IEEE signed zeros survive.  A float
    one-hot DOT here would turn -0.0 into +0.0 (1*(-0.0) + 0*x sums to +0.0)
    -- and the reference really does hold -0.0 in agent vx/vy after a fully
    blocked step (obj->vy *= vy_pct with vy_pct == 0, bag.cpp:654-655)."""
    oh = slots_onehot(ents.capacity, idxs)  # (M, E) bool
    out = {}
    for n in names:
        f = getattr(ents, n)
        if f.dtype == jnp.bool_:
            out[n] = jnp.any(oh & f[None, :], axis=1)
            continue
        bits = (
            jax.lax.bitcast_convert_type(f, jnp.int32)
            if f.dtype == jnp.float32
            else f
        )
        # dtype pinned: under x64 (parity mode) jnp.sum would promote to
        # int64 and the bitcast back would grow a trailing axis
        g = jnp.sum(jnp.where(oh, bits[None, :], 0), axis=1, dtype=jnp.int32)
        out[n] = (
            jax.lax.bitcast_convert_type(g, jnp.float32)
            if f.dtype == jnp.float32
            else g.astype(f.dtype)
        )
    return out


def write_slots_masked(ents: EntityTable, idxs, mask, **updates) -> EntityTable:
    """Write (M,)-shaped ``updates`` into slots ``idxs`` where ``mask`` (M,)
    holds (idxs must be distinct).  Bit-exact one-hot scatter: floats move
    as i32 bit patterns so -0.0 survives (see read_slots)."""
    oh = slots_onehot(ents.capacity, idxs) & mask[:, None]  # (M, E)
    sel = jnp.any(oh, axis=0)  # (E,)
    new = {}
    for name, val in updates.items():
        arr = getattr(ents, name)
        val = jnp.asarray(val)
        if arr.dtype == jnp.bool_:
            scat = jnp.any(oh & val.astype(jnp.bool_)[:, None], axis=0)
        else:
            val = val.astype(arr.dtype)
            bits = (
                jax.lax.bitcast_convert_type(val, jnp.int32)
                if arr.dtype == jnp.float32
                else val
            )
            scat = jnp.sum(
                jnp.where(oh, bits[:, None], 0), axis=0, dtype=jnp.int32
            )
            scat = (
                jax.lax.bitcast_convert_type(scat, jnp.float32)
                if arr.dtype == jnp.float32
                else scat.astype(arr.dtype)
            )
        new[name] = jnp.where(sel, scat, arr)
    return ents.replace(**new)


def append_entity(ents: EntityTable, fields: dict, active=True):
    """push_back: append at slot ``count``; returns (ents, idx).

    If the table is full the append is dropped (size MAX_ENT per game must be
    chosen so this cannot happen in-distribution; an overflow is detectable as
    count == capacity).
    """
    idx = jnp.sum(ents.alive.astype(I32))
    ok = jnp.logical_and(jnp.asarray(active), idx < ents.capacity)
    slot = jnp.minimum(idx, ents.capacity - 1)
    ents = write_slot_masked(ents, slot, ok, **fields)
    return ents, slot


def make_entity(x, y, vx, vy, rx, ry, type_) -> dict:
    return default_entity_fields(x, y, vx, vy, rx, ry, type_)


def append_entities_masked(ents: EntityTable, fields: dict, mask, descending=True):
    """Append one entity per masked source slot, in ascending (or descending)
    source-slot order, each field given as an ``(E,)`` candidate array.

    Vectorized equivalent of a reference loop that pushes_back one child per
    matching entity (e.g. bossfight's laser-trail loop, bossfight.cpp:419-431,
    which iterates slots in reverse).  Overflow appends are dropped.
    """
    E = ents.capacity
    idx = jnp.arange(E)
    big = 2 * E
    key = jnp.where(mask, (E - 1 - idx) if descending else idx, big)
    order = jnp.argsort(key)  # masked srcs first, in append order
    n = jnp.sum(mask.astype(I32))
    cnt = jnp.sum(ents.alive.astype(I32))
    k = jnp.arange(E)
    valid = (k < n) & (cnt + k < E)
    dest = jnp.where(valid, cnt + k, E)  # E = out of range -> dropped
    # one packed gather + one packed scatter (see pack_table)
    packed, names = pack_table(ents)
    src = jnp.stack(
        [
            (
                jnp.ones((E,), jnp.float32)
                if name == "alive"
                else jnp.asarray(fields[name]).astype(jnp.float32)
            )
            for name in names
        ],
        axis=-1,
    )[order]
    packed = packed.at[dest].set(src)
    return unpack_table(ents, packed, names)


def entity_vs_all(ents: EntityTable, x, y, rx, ry, margin=0.0):
    """AABB overlap of one box vs every slot (has_collision, bag.cpp:1145-1150)."""
    tx = (rx + ents.rx) + jnp.asarray(margin, F32)
    ty = (ry + ents.ry) + jnp.asarray(margin, F32)
    return jnp.logical_and(
        jnp.abs(x - ents.x) < tx, jnp.abs(y - ents.y) < ty
    )


def has_collision_pair(ents: EntityTable, i, j, margin) -> jax.Array:
    tx = ents.rx[i] + ents.rx[j] + margin
    ty = ents.ry[i] + ents.ry[j] + margin
    return jnp.logical_and(
        jnp.abs(ents.x[i] - ents.x[j]) < tx,
        jnp.abs(ents.y[i] - ents.y[j]) < ty,
    )


def is_out_of_bounds(x, y, rx, ry, main_width, main_height):
    """bag.cpp:1068-1084."""
    w = main_width.astype(F32)
    h = main_height.astype(F32)
    return (
        (x + rx < 0) | (y + ry < 0) | (x - rx > w) | (y - ry > h)
    )


def has_any_collision_mask(
    ents: EntityTable, x, y, rx, ry, margin=0.0, exclude: Optional[jax.Array] = None
):
    """Alive slots (minus ``exclude``) that collide and don't avoid collisions."""
    coll = entity_vs_all(ents, x, y, rx, ry, margin)
    mask = jnp.logical_and(ents.alive, ~ents.avoids_collisions)
    if exclude is not None:
        mask = jnp.logical_and(mask, jnp.arange(ents.capacity) != exclude)
    return jnp.logical_and(coll, mask)


def has_agent_collision_from(ents: EntityTable, x, y, rx, ry, type_, margin):
    """has_agent_collision for a candidate box (bag.cpp:1126-1131)."""
    agent_coll = entity_vs_all(ents, x, y, rx, ry, margin)[AGENT]
    return jnp.logical_and(type_ != O.PLAYER, agent_coll)


def rand_pos(rs, r, lo, hi, active=True):
    """bag.cpp:1100-1108.  NOTE: consumes a draw only when the box is loose
    (max - min > 2r); the tight case returns the midpoint without touching the
    stream -- this conditional consumption is part of the RNG contract.

    ``rs``: any draw source (MT or open MTBlock)."""
    lo = jnp.asarray(lo, F32)
    hi = jnp.asarray(hi, F32)
    r = jnp.asarray(r, F32)
    tight = (hi - lo) <= 2 * r
    draw_active = jnp.logical_and(jnp.asarray(active), ~tight)
    rs, u = R.rs_rand01(rs, active=draw_active)
    # (range - 2r) * u + r + lo rounds left-to-right in f32 (bag.cpp:1107);
    # keeping a second live use of the product stops LLVM contracting the
    # mul+add into an FMA (the reference targets ivybridge: no FMA), and
    # the barrier stops XLA reassociating the trailing "+ r + lo".
    # The predicate u != 2.0 is ALWAYS true (rand01 returns [0, 1)): the
    # where exists purely to keep `prod` multi-use.  If a future compiler
    # value-ranges u or folds the where, the contraction silently returns;
    # the tests/test_ref_parity.py sweep is the regression gate for that.
    prod = (hi - lo - 2 * r) * u
    pinned = jnp.where(u != F32(2.0), prod + r, prod)
    loose_val = jax.lax.optimization_barrier(pinned) + lo
    return rs, jnp.where(tight, (hi + lo) / 2, loose_val)


def reposition(
    rs,
    state: EnvState,
    rx,
    ry,
    type_,
    collision_margin,
    x,
    y,
    w,
    h,
    check_collisions,
    exclude: Optional[jax.Array] = None,
    active=True,
):
    """bag.cpp:541-560: rejection-sample a position (<= 100 retries).

    Returns (rs, px, py).  ``exclude`` masks out a slot from the
    any-collision test (used when repositioning an existing entity).
    The loop is a bounded fori with per-env active masking so each env
    consumes exactly as many draws as the reference would.  ``active``
    gates all draws (for spawns that only happen in some envs).
    """
    ents = state.ents
    active = jnp.asarray(active)

    def try_place(rs, active):
        rs, px = rand_pos(rs, rx, x, x + w, active)
        rs, py = rand_pos(rs, ry, y, y + h, active)
        return rs, px, py

    rs, px, py = try_place(rs, active)

    def bad(px, py):
        agent_hit = has_agent_collision_from(ents, px, py, rx, ry, type_, collision_margin)
        any_hit = jnp.any(
            has_any_collision_mask(ents, px, py, rx, ry, 0.0, exclude=exclude)
        )
        return agent_hit | jnp.logical_and(check_collisions, any_hit)

    def body(_, carry):
        rs, px, py, act = carry
        act = jnp.logical_and(act, bad(px, py))
        rs, nx2 = rand_pos(rs, rx, x, x + w, act)
        rs, ny2 = rand_pos(rs, ry, y, y + h, act)
        px = jnp.where(act, nx2, px)
        py = jnp.where(act, ny2, py)
        return rs, px, py, act

    rs, px, py, _ = jax.lax.fori_loop(0, 100, body, (rs, px, py, active))
    return rs, px, py


def spawn_entity_rxy(
    rs, state: EnvState, rx, ry, type_, x, y, w, h, check_collisions=True, active=True
):
    """bag.cpp:511-519: reposition a fresh entity then push_back.

    Returns (rs, state, idx)."""
    fields = make_entity(0.0, 0.0, 0.0, 0.0, rx, ry, type_)
    rs, px, py = reposition(
        rs, state, rx, ry, type_, fields["collision_margin"], x, y, w, h,
        check_collisions, active=active,
    )
    fields["x"] = px
    fields["y"] = py
    ents, idx = append_entity(state.ents, fields, active)
    return rs, state.replace(ents=ents), idx


def add_entity_rxy(state: EnvState, x, y, vx, vy, rx, ry, type_, active=True):
    fields = make_entity(x, y, vx, vy, rx, ry, type_)
    ents, idx = append_entity(state.ents, fields, active)
    return state.replace(ents=ents), idx


def compact(ents: EntityTable, main_width, main_height) -> EntityTable:
    """erase_if_needed (bag.cpp:748-756): drop will_erase / auto-erased OOB
    slots, stably compacting survivors (matches reverse-order vector::erase)."""
    oob = is_out_of_bounds(ents.x, ents.y, ents.rx, ents.ry, main_width, main_height)
    dead = ents.will_erase | (ents.auto_erase & oob)
    dead = jnp.logical_or(dead, ~ents.alive)
    E = ents.capacity
    order = jnp.where(dead, E + jnp.arange(E), jnp.arange(E))
    perm = jnp.argsort(order)
    # one packed gather for all ~31 fields (see pack_table)
    packed, names = pack_table(ents)
    new = unpack_table(ents, packed[perm], names)
    n_alive = jnp.sum((~dead).astype(I32))
    return new.replace(alive=jnp.arange(E) < n_alive)


def find_entity_index(ents: EntityTable, type_) -> jax.Array:
    """bag.cpp:1133-1143: last matching index, -1 if none."""
    idxs = jnp.arange(ents.capacity)
    match = jnp.logical_and(ents.alive, ents.type == type_)
    return jnp.max(jnp.where(match, idxs, -1))
