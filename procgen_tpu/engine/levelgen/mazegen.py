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


def _neighbor_vals(grid):
    """Values of the 4-neighbors in reference push order (mazegen.cpp:48-67):
    left (x-1), up (y-1), down (y+1), right (x+1).  Out-of-array neighbors
    read INVALID_OBJ (the reference's border get_obj, mazegen.cpp:36-45)."""
    AD = grid.shape[0]
    inv_c = jnp.full((AD, 1), O.INVALID_OBJ, I32)
    inv_r = jnp.full((1, AD), O.INVALID_OBJ, I32)
    left = jnp.concatenate([inv_c, grid[:, :-1]], axis=1)
    up = jnp.concatenate([inv_r, grid[:-1, :]], axis=0)
    down = jnp.concatenate([grid[1:, :], inv_r], axis=0)
    right = jnp.concatenate([grid[:, 1:], inv_c], axis=1)
    return left, up, down, right


def _dilate(vis):
    out = vis
    out = out.at[:, 1:].set(out[:, 1:] | vis[:, :-1])
    out = out.at[:, :-1].set(out[:, :-1] | vis[:, 1:])
    out = out.at[1:, :].set(out[1:, :] | vis[:-1, :])
    out = out.at[:-1, :].set(out[:-1, :] | vis[1:, :])
    return out


def generate_maze_no_dead_ends(rs, maze_dim, max_dim: int):
    """mazegen.cpp:189-210: perfect maze, then open a random wall next to
    every dead end (MsPacman style).

    The dead-end scan is sequential in ascending cell order -- each opened
    wall becomes SPACE and changes neighbor counts for later cells -- so it
    runs as a fori over the flat grid with masked draws.

    Returns (rs, grid) with grid (max_dim+2, max_dim+2) int32 [y, x].
    """
    res = generate_maze(rs, maze_dim, max_dim)
    rs = res.rng
    AD = max_dim + 2
    md = jnp.asarray(maze_dim, I32)
    flat0 = res.grid.reshape(-1)

    def body(i, carry):
        rs, flat = carry
        x = i % AD
        y = i // AD
        interior = (x >= 1) & (x <= md) & (y >= 1) & (y <= md)
        nidx = jnp.stack([i - 1, i - AD, i + AD, i + 1])  # l, u, d, r order
        nx = nidx % AD
        ny = nidx // AD
        n_int = (nx >= 1) & (nx <= md) & (ny >= 1) & (ny <= md)
        nvals = jnp.where(
            n_int, flat[jnp.clip(nidx, 0, AD * AD - 1)], O.INVALID_OBJ
        )
        is_dead_end = (
            interior
            & (flat[i] == O.SPACE)
            & (jnp.sum((nvals == O.SPACE).astype(I32)) == 1)
        )
        wall_mask = nvals == O.WALL_OBJ
        n_wall = jnp.sum(wall_mask.astype(I32))
        do = is_dead_end & (n_wall > 0)
        rs, n = R.rs_randn(rs, jnp.maximum(n_wall, 1), active=do)
        # n-th wall neighbor in l/u/d/r push order
        pos = jnp.cumsum(wall_mask.astype(I32)) - 1
        sel = jnp.argmax(wall_mask & (pos == n))
        widx = nidx[sel]
        flat = flat.at[widx].set(jnp.where(do, O.SPACE, flat[widx]))
        return rs, flat

    rs, flat = jax.lax.fori_loop(0, AD * AD, body, (rs, flat0))
    return rs, flat.reshape(AD, AD)


def generate_maze_with_doors(
    rs, num_doors, maze_dim, max_dim: int, max_doors: int = 3
):
    """mazegen.cpp:211-289: perfect maze + sequential door/key placement.

    ``num_doors`` traced (<= max_doors).  Returns (rs, grid) where grid is the
    (max_dim+2, max_dim+2) [y, x] array containing WALL_OBJ / SPACE /
    AGENT_OBJ / EXIT_OBJ / DOOR_OBJ+k / KEY_OBJ+k.

    The reference's ``std::set`` BFS (``expand_to_type``) iterates waves in
    ascending cell order; door discovery is therefore "minimum (BFS-wave,
    cell-index) among cells adjacent to an unnumbered door", reproduced here
    with mask dilation; the n-th-smallest-element draw of ``choose_one`` over
    a set maps to ``choose_nth_masked``.
    """
    from procgen_tpu.engine.rand_util import choose_n_erase, choose_nth_masked

    res = generate_maze(rs, maze_dim, max_dim)
    rs = res.rng
    AD = max_dim + 2
    grid = res.grid
    md = jnp.asarray(maze_dim, I32)

    def space_mask(g):
        return g == O.SPACE

    # forks: space cells with > 2 space neighbors (mazegen.cpp:215-227)
    l, u, d, r = _neighbor_vals(grid)
    nsp = sum((v == O.SPACE).astype(I32) for v in (l, u, d, r))
    forks = space_mask(grid) & (nsp > 2)

    # chosen = choose_n(forks, num_doors) (mazegen.cpp:229-236)
    rs, picks, ndoors = choose_n_erase(
        rs, forks.reshape(-1), max_doors, num_doors
    )
    flat = grid.reshape(-1)
    for s in range(max_doors):
        do = s < ndoors
        flat = flat.at[picks[s]].set(
            jnp.where(do, O.DOOR_OBJ, flat[picks[s]])
        )
    grid = flat.reshape(AD, AD)

    # agent cell: choose_one(space) rejecting door-adjacent (mazegen.cpp:238-253)
    l, u, d, r = _neighbor_vals(grid)
    door_adj = (
        (l == O.DOOR_OBJ) | (u == O.DOOR_OBJ) | (d == O.DOOR_OBJ)
        | (r == O.DOOR_OBJ)
    ).reshape(-1)
    space_flat = space_mask(grid).reshape(-1)
    n_space = jnp.sum(space_flat.astype(I32))
    rs, m0 = R.rs_randn(rs, n_space)
    cell0 = choose_nth_masked(space_flat, m0)

    def agent_body(_, carry):
        rs, cell, active = carry
        active = jnp.logical_and(active, door_adj[cell])
        rs, m = R.rs_randn(rs, n_space, active=active)
        cell = jnp.where(active, choose_nth_masked(space_flat, m), cell)
        return rs, cell, active

    rs, agent_cell, _ = jax.lax.fori_loop(
        0, 64, agent_body, (rs, cell0, jnp.asarray(True))
    )
    flat = grid.reshape(-1).at[agent_cell].set(O.AGENT_OBJ)
    grid = flat.reshape(AD, AD)

    visited = jnp.zeros((AD * AD,), jnp.bool_).at[agent_cell].set(True)

    for round_ in range(max_doors + 1):
        round_active = round_ <= ndoors
        search_active = round_ < ndoors

        l, u, d, r = _neighbor_vals(grid)
        door_adj = (
            (l == O.DOOR_OBJ) | (u == O.DOOR_OBJ) | (d == O.DOOR_OBJ)
            | (r == O.DOOR_OBJ)
        ).reshape(-1)
        space_flat = space_mask(grid).reshape(-1)

        # expand_to_type(s0, s1, DOOR_OBJ): BFS waves, first door-adjacent
        # cell in (wave, index) order (mazegen.cpp:69-98)
        def search_cond(c):
            vis, wave, found = c
            return jnp.logical_and(
                search_active, jnp.logical_and(~found, jnp.any(wave))
            )

        def search_body(c):
            vis, wave, found = c
            hit = jnp.any(wave & door_adj)
            new = (
                _dilate(vis.reshape(AD, AD)).reshape(-1) & space_flat & ~vis
            )
            vis = jnp.where(hit, vis, vis | new)
            wave = jnp.where(hit, wave, new)
            return vis, wave, found | hit

        vis1, wave1, found = jax.lax.while_loop(
            search_cond, search_body, (visited, visited, jnp.asarray(False))
        )
        found_cell = jnp.argmax(wave1 & door_adj)
        # first DOOR_OBJ neighbor in push order left/up/down/right
        lf, uf, df, rf = (v.reshape(-1) for v in (l, u, d, r))
        fd = jnp.where(
            lf[found_cell] == O.DOOR_OBJ, found_cell - 1,
            jnp.where(
                uf[found_cell] == O.DOOR_OBJ, found_cell - AD,
                jnp.where(
                    df[found_cell] == O.DOOR_OBJ, found_cell + AD,
                    found_cell + 1,
                ),
            ),
        )
        do_rename = search_active & found
        flat = grid.reshape(-1)
        flat = flat.at[fd].set(
            jnp.where(do_rename, O.DOOR_OBJ + round_ + 1, flat[fd])
        )
        grid = flat.reshape(AD, AD)
        space_flat = space_mask(grid).reshape(-1)

        # expand_to_type(s0, s1, -999): full flood (renamed door blocks)
        def flood_cond(c):
            vis, grew = c
            return jnp.logical_and(round_active, grew)

        def flood_body(c):
            vis, _ = c
            new = _dilate(vis.reshape(AD, AD)).reshape(-1) & space_flat & ~vis
            return vis | new, jnp.any(new)

        vis2, _ = jax.lax.while_loop(
            flood_cond, flood_body, (vis1, jnp.asarray(True))
        )
        s1 = vis2 & ~visited
        n_s1 = jnp.sum(s1.astype(I32))
        rs, n = R.rs_randn(rs, jnp.maximum(n_s1, 1), active=round_active)
        key_cell = choose_nth_masked(s1, n)
        val = jnp.where(
            round_ == ndoors, O.EXIT_OBJ, O.KEY_OBJ + round_ + 1
        )
        flat = grid.reshape(-1)
        flat = flat.at[key_cell].set(
            jnp.where(round_active, val, flat[key_cell])
        )
        grid = flat.reshape(AD, AD)
        visited = jnp.where(round_active, vis2, visited)
        visited = visited.at[fd].set(visited[fd] | do_rename)

    return rs, grid


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
