"""Kruskal maze generation (reference: procgen/src/mazegen.cpp).

The reference keeps an erase-based wall vector and per-cell ``std::set``
partitions; we re-express it with fixed bounds so it traces once and runs
batched:

* wall list -- built for the *maximum* dim with validity masks, stably
  compacted so wall order matches the reference's construction order
  (verticals i-major then horizontals, mazegen.cpp:138-151);
* ``vector::erase`` of a random wall -- a ``removed`` bitmap; the logical
  index drawn by ``randn(walls.size())`` maps to the n-th surviving wall in
  original order via a cumulative count (no shifting needed);
* set partitions -- a per-cell label array; merging set s0 into s1 is a
  vectorized relabel.

All functions are single-env (vmap-lifted); loop trip counts are static
(W_MAX iterations, inactive tail masked) and RNG draws are masked so each env
consumes exactly the reference's stream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu import objects as O
from procgen_tpu import rng as R
from procgen_tpu.state import I32

MAZE_OFFSET = 1  # mazegen.h


class MazeResult(NamedTuple):
    rng: R.MT
    grid: jax.Array  # i32 (AD, AD) indexed [y, x]; AD = max_dim + 2
    free_cells: jax.Array  # i32 (max_dim**2,) in insertion order
    num_free_cells: jax.Array  # i32 scalar


def _static_wall_table(max_dim: int):
    """Wall candidates for the maximum dim, in reference construction order.

    Returns (coords[Wmax, 4] int32, i_vals, j_vals arrays) where validity for
    an actual ``maze_dim`` is evaluated at trace time per env.
    Vertical group (mazegen.cpp:138-144): i odd, j even, wall (i-1,j,i+1,j).
    Horizontal group (:146-151): i even, j odd, wall (i,j-1,i,j+1).
    """
    walls = []
    conds = []  # (is_vertical, i, j) to evaluate validity against maze_dim
    for i in range(1, max_dim, 2):
        for j in range(0, max_dim, 2):
            walls.append((i - 1, j, i + 1, j))
            conds.append((i, j))
    n_v = len(walls)
    for i in range(0, max_dim, 2):
        for j in range(1, max_dim, 2):
            walls.append((i, j - 1, i, j + 1))
            conds.append((i, j))
    coords = np.asarray(walls, np.int32)
    cond_ij = np.asarray(conds, np.int32)
    is_vertical = np.arange(len(walls)) < n_v
    return coords, cond_ij, is_vertical


def generate_maze(mt: R.MT, maze_dim, max_dim: int) -> MazeResult:
    """mazegen.cpp:112-187; ``maze_dim`` traced (odd, 3..max_dim)."""
    AD = max_dim + 2
    NC = max_dim * max_dim

    grid = jnp.full((AD, AD), O.WALL_OBJ, I32)
    grid = grid.at[MAZE_OFFSET, MAZE_OFFSET].set(0)  # cell (0,0) := 0 (:119)
    labels = jnp.arange(NC, dtype=I32)  # cell_sets_idxs[i] = i (:126-136)
    free_cells = jnp.zeros((NC,), I32)
    in_free_set = jnp.zeros((NC,), jnp.bool_)
    num_free = jnp.asarray(0, I32)

    coords_np, cond_np, is_vert_np = _static_wall_table(max_dim)
    W_MAX = coords_np.shape[0]
    coords = jnp.asarray(coords_np)
    cond_i = jnp.asarray(cond_np[:, 0])
    cond_j = jnp.asarray(cond_np[:, 1])
    # validity vs the actual maze_dim: loop bounds i,j < maze_dim plus the
    # interior guard 0 < odd-coordinate < maze_dim-1 (odd coord is i for the
    # vertical group, j for the horizontal group).
    md = jnp.asarray(maze_dim, I32)
    is_vert = jnp.asarray(is_vert_np)
    odd_c = jnp.where(is_vert, cond_i, cond_j)
    valid = (cond_i < md) & (cond_j < md) & (odd_c < md - 1) & (odd_c > 0)

    # stable compaction to reference order
    pos = jnp.cumsum(valid.astype(I32)) - 1
    n_walls = jnp.sum(valid.astype(I32))
    walls = jnp.zeros((W_MAX, 4), I32)
    scatter_idx = jnp.where(valid, pos, W_MAX - 1)
    # scatter in reverse order safety: positions are unique among valid;
    # invalid all collide on W_MAX-1 but are never read (k < n_walls).
    walls = walls.at[scatter_idx].set(coords, mode="drop")

    removed = jnp.zeros((W_MAX,), jnp.bool_)

    def set_free_cell(carry, x, y, do):
        """mazegen.cpp:26-34, applied where ``do``."""
        grid, free_cells, in_free_set, num_free = carry
        grid = grid.at[y + MAZE_OFFSET, x + MAZE_OFFSET].set(
            jnp.where(do, O.SPACE, grid[y + MAZE_OFFSET, x + MAZE_OFFSET])
        )
        cell = md * y + x
        cellc = jnp.clip(cell, 0, NC - 1)
        is_new = jnp.logical_and(do, ~in_free_set[cellc])
        free_cells = free_cells.at[jnp.clip(num_free, 0, NC - 1)].set(
            jnp.where(is_new, cell, free_cells[jnp.clip(num_free, 0, NC - 1)])
        )
        in_free_set = in_free_set.at[cellc].set(in_free_set[cellc] | is_new)
        num_free = num_free + is_new.astype(I32)
        return (grid, free_cells, in_free_set, num_free)

    def body(k, carry):
        mt, grid, labels, free_cells, in_free_set, num_free, removed = carry
        active = k < n_walls
        remaining = n_walls - k
        mt, n = R.rs_randn(mt, jnp.maximum(remaining, 1), active=active)
        # logical n -> physical index among surviving walls, original order
        alive_pos = jnp.cumsum((~removed).astype(I32)) - 1
        match = jnp.logical_and(~removed, alive_pos == n)
        phys = jnp.argmax(match)
        w = walls[phys]
        x1, y1, x2, y2 = w[0], w[1], w[2], w[3]
        s0 = labels[jnp.clip(md * y1 + x1, 0, NC - 1)]
        s1 = labels[jnp.clip(md * y2 + x2, 0, NC - 1)]
        x0 = (x1 + x2) // 2
        y0 = (y1 + y2) // 2
        center = md * y0 + x0
        can_remove = jnp.logical_and(
            grid[y0 + MAZE_OFFSET, x0 + MAZE_OFFSET] == O.WALL_OBJ, s0 != s1
        )
        do = jnp.logical_and(active, can_remove)

        c = (grid, free_cells, in_free_set, num_free)
        c = set_free_cell(c, x1, y1, do)
        c = set_free_cell(c, x0, y0, do)
        c = set_free_cell(c, x2, y2, do)
        grid, free_cells, in_free_set, num_free = c

        # merge s0 -> s1 and add center (mazegen.cpp:176-183)
        labels = jnp.where(jnp.logical_and(do, labels == s0), s1, labels)
        labels = labels.at[jnp.clip(center, 0, NC - 1)].set(
            jnp.where(do, s1, labels[jnp.clip(center, 0, NC - 1)])
        )
        removed = removed.at[phys].set(removed[phys] | active)
        return (mt, grid, labels, free_cells, in_free_set, num_free, removed)

    carry = (mt, grid, labels, free_cells, in_free_set, num_free, removed)
    mt, grid, labels, free_cells, in_free_set, num_free, removed = jax.lax.fori_loop(
        0, W_MAX, body, carry
    )
    return MazeResult(mt, grid, free_cells, num_free)


def place_objects(
    mt: R.MT,
    res: MazeResult,
    start_obj: int,
    num_objs: int,
    maze_dim,
    max_dim: int,
    max_tries: int = 32,
):
    """mazegen.cpp:292-306: place objects on distinct free cells (never cell
    0, the agent start).  Rejection redraws are bounded by ``max_tries``
    (P(exhaust) < (k/num_free)^32, negligible for real mazes).

    Returns (mt, grid) with the objects written into res.grid.
    """
    grid = res.grid
    free_cells = res.free_cells
    NC = max_dim * max_dim
    md = jnp.asarray(maze_dim, I32)

    for j in range(num_objs):
        m0 = jnp.asarray(0, I32)
        mt, m0 = R.rs_randn(mt, res.num_free_cells)

        def bad(m):
            v = free_cells[jnp.clip(m, 0, NC - 1)]
            return jnp.logical_or(v == -1, v == 0)

        def body(_, carry):
            mt, m, active = carry
            active = jnp.logical_and(active, bad(m))
            mt, m2 = R.rs_randn(mt, res.num_free_cells, active=active)
            m = jnp.where(active, m2, m)
            return mt, m, active

        mt, m, _ = jax.lax.fori_loop(
            0, max_tries, body, (mt, m0, jnp.asarray(True))
        )
        cell = free_cells[jnp.clip(m, 0, NC - 1)]
        free_cells = free_cells.at[jnp.clip(m, 0, NC - 1)].set(-1)
        cx = cell % md + MAZE_OFFSET
        cy = cell // md + MAZE_OFFSET
        grid = grid.at[cy, cx].set(start_obj + j)

    return mt, res._replace(grid=grid, free_cells=free_cells)
