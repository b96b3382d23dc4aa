"""RoomGenerator: cellular-automata caves (reference: roomgen.{h,cpp}).

All functions operate on a padded ``(Hm, Wm) int32`` grid (row-major [y, x])
with a per-env actual ``dim`` (worlds are square for the games that use this:
caveflyer, jumper).  The CA update is a 3x3 convolution; connected components
use min-label propagation; only ``find_path`` needs the reference's exact BFS
discovery order (its parent chain decides *which* shortest path is kept, and
level layout depends on it), so that one runs the queue sequentially.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from procgen_tpu import objects as O
from procgen_tpu.state import I32

BOOL = jnp.bool_


def _in_dim(dim, Hm, Wm):
    xs = jnp.arange(Wm)[None, :]
    ys = jnp.arange(Hm)[:, None]
    return (xs < dim) & (ys < dim)


def ca_update(grid, dim, oob_is_wall=True):
    """RoomGenerator::update (roomgen.cpp:21-36): >= 5 of 9 neighbors WALL
    (out-of-bounds counts as the out_of_bounds_object, WALL during levelgen)
    -> WALL, else SPACE.  Cells beyond ``dim`` are left untouched."""
    Hm, Wm = grid.shape
    inside = _in_dim(dim, Hm, Wm)
    wall = jnp.where(inside, (grid == O.WALL_OBJ).astype(I32), 0)
    # 3x3 sum with OOB treated as wall: sum walls inside, add OOB count
    padded = jnp.pad(wall, 1)
    s = jnp.zeros_like(wall)
    in_pad = jnp.pad(inside.astype(I32), 1)
    n_in = jnp.zeros_like(wall)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = s + padded[1 + dy : 1 + dy + Hm, 1 + dx : 1 + dx + Wm]
            n_in = n_in + in_pad[1 + dy : 1 + dy + Hm, 1 + dx : 1 + dx + Wm]
    count = s + (9 - n_in) * (1 if oob_is_wall else 0)
    new = jnp.where(count >= 5, O.WALL_OBJ, O.SPACE)
    return jnp.where(inside, new, grid)


def best_room_mask(grid, dim):
    """find_best_room (roomgen.cpp:126-145): largest 4-connected SPACE
    component; ties go to the component containing the smallest cell index
    (the reference keeps the first strictly-larger room found in ascending
    scan order).  Returns a bool mask."""
    Hm, Wm = grid.shape
    inside = _in_dim(dim, Hm, Wm)
    space = inside & (grid == O.SPACE)
    idx = (jnp.arange(Hm)[:, None] * dim + jnp.arange(Wm)[None, :]).astype(I32)
    big = Hm * Wm * 4
    labels = jnp.where(space, idx, big)

    def prop(labels):
        p = jnp.pad(labels, 1, constant_values=big)
        m = labels
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            m = jnp.minimum(m, p[1 + dy : 1 + dy + Hm, 1 + dx : 1 + dx + Wm])
        return jnp.where(space, m, big)

    def cond(c):
        labels, changed = c
        return changed

    def body(c):
        labels, _ = c
        new = prop(labels)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.asarray(True))
    )
    sizes = jnp.zeros((Hm * Wm + 1,), I32).at[
        jnp.clip(labels.reshape(-1), 0, Hm * Wm)
    ].add(space.reshape(-1).astype(I32))
    # best = max size, tie -> smallest label (ascending-scan first-found);
    # fits i32: sizes*(G+1) <= 3600*3601 ~ 1.3e7 for the largest (60x60) world
    order_key = sizes * (Hm * Wm + 1) - jnp.arange(Hm * Wm + 1, dtype=I32)
    best_label = jnp.argmax(order_key[: Hm * Wm]).astype(I32)
    return space & (labels == best_label)


def expand_mask(grid, dim, mask, n: int):
    """expand_room (roomgen.cpp:147-177): n rounds of 8-neighborhood growth
    into SPACE cells."""
    Hm, Wm = grid.shape
    inside = _in_dim(dim, Hm, Wm)
    space = inside & (grid == O.SPACE)
    out = mask
    for _ in range(n):
        p = jnp.pad(out & space, 1)
        grown = jnp.zeros_like(out)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                grown = grown | p[1 + dy : 1 + dy + Hm, 1 + dx : 1 + dx + Wm]
        out = out | (grown & space)
    return out


def find_path_mask(grid, dim, src, dst, max_iters: int):
    """find_path (roomgen.cpp:71-124): exact BFS with the reference's queue
    discovery order (neighbor push order left, down, up, right), returning
    the backtracked path as a bool mask over flat cell indices.

    ``src``/``dst`` are flat indices (idx = y * dim + x).  The queue is
    simulated sequentially because the parent chain (hence which shortest
    path is returned) depends on discovery order."""
    Hm, Wm = grid.shape
    G = Hm * Wm
    inside = _in_dim(dim, Hm, Wm)
    space = (inside & (grid == O.SPACE)).reshape(-1)
    # flat index in *dim* coords; convert neighbors via x/y decompose
    expanded = jnp.zeros((G,), I32)
    parents = jnp.full((G,), -1, I32)
    covered = jnp.zeros((G,), BOOL)
    expanded = expanded.at[0].set(src)
    tail = jnp.asarray(1, I32)
    search = jnp.asarray(0, I32)

    def sp_at(i):
        x = i % dim
        y = i // dim
        return space[jnp.clip(y, 0, Hm - 1) * Wm + jnp.clip(x, 0, Wm - 1)]

    def cond(c):
        expanded, parents, covered, tail, search = c
        return (search < tail) & (expanded[jnp.clip(search, 0, G - 1)] != dst)

    def body(c):
        expanded, parents, covered, tail, search = c
        cur = expanded[jnp.clip(search, 0, G - 1)]
        x = cur % dim
        y = cur // dim
        for dx, dy in ((-1, 0), (0, -1), (0, 1), (1, 0)):
            nx2 = x + dx
            ny2 = y + dy
            ok = (nx2 >= 0) & (nx2 < dim) & (ny2 >= 0) & (ny2 < dim)
            ni = ny2 * dim + nx2
            nic = jnp.clip(ni, 0, G - 1)
            ok = ok & ~covered[nic] & sp_at(nic)
            slot = jnp.clip(tail, 0, G - 1)
            expanded = expanded.at[slot].set(
                jnp.where(ok, nic, expanded[slot])
            )
            parents = parents.at[slot].set(jnp.where(ok, search, parents[slot]))
            covered = covered.at[nic].set(covered[nic] | ok)
            tail = tail + ok.astype(I32)
        return expanded, parents, covered, tail, search + 1

    expanded, parents, covered, tail, search = jax.lax.while_loop(
        cond, body, (expanded, parents, covered, tail, search)
    )

    # backtrack from `search` (the queue slot holding dst)
    found = (search < tail) & (
        expanded[jnp.clip(search, 0, G - 1)] == dst
    )
    path = jnp.zeros((G,), BOOL)

    def bcond(c):
        path, k = c
        return k >= 0

    def bbody(c):
        path, k = c
        kc = jnp.clip(k, 0, G - 1)
        cell = expanded[kc]
        path = path.at[jnp.clip(cell, 0, G - 1)].set(True)
        return path, parents[kc]

    path, _ = jax.lax.while_loop(
        bcond, bbody, (path, jnp.where(found, search, -1))
    )
    return path  # flat over dim coords


def flat_to_grid_mask(path_flat, dim, Hm, Wm):
    """Flat dim-coord bool vector -> (Hm, Wm) mask."""
    xs = jnp.arange(Wm)[None, :]
    ys = jnp.arange(Hm)[:, None]
    flat = ys * dim + xs
    ok = (xs < dim) & (ys < dim)
    G = Hm * Wm
    return ok & path_flat[jnp.clip(flat, 0, G - 1)]
