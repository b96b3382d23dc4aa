"""RandGen collection helpers (reference: randgen.cpp:33-88) over a generic
draw source (MT or open MTBlock)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from procgen_tpu import rng as R
from procgen_tpu.state import I32


def simple_choose(rs, n: int, k: int, max_tries: int = 16):
    """randgen.cpp:70-88: draw k distinct values in [0, n) by rejection.

    ``n``/``k`` static.  Each rejection redraw is bounded by ``max_tries``
    (P(exhaust) <= (k/n)^max_tries per pick, negligible at reference load
    factors).  Returns (rs, chosen int32 (k,))."""
    in_set = jnp.zeros((n,), jnp.bool_)
    chosen = jnp.zeros((k,), I32)

    def pick(i, carry):
        rs, chosen, in_set = carry
        rs, nxt = R.rs_randn(rs, n)

        def retry(_, c):
            rs, nxt, active = c
            active = jnp.logical_and(active, in_set[nxt])
            rs, nxt2 = R.rs_randn(rs, n, active=active)
            nxt = jnp.where(active, nxt2, nxt)
            return rs, nxt, active

        rs, nxt, _ = jax.lax.fori_loop(
            0, max_tries, retry, (rs, nxt, jnp.asarray(True))
        )
        chosen = chosen.at[i].set(nxt)
        in_set = in_set.at[nxt].set(True)
        return rs, chosen, in_set

    rs, chosen, _ = jax.lax.fori_loop(0, k, pick, (rs, chosen, in_set))
    return rs, chosen


def simple_choose_dyn(rs, n, k, n_max: int, k_max: int, max_tries: int = 16):
    """simple_choose with traced ``n`` (<= n_max) and traced ``k`` (<= k_max).

    Returns (rs, chosen (k_max,)); entries past k are unspecified."""
    in_set = jnp.zeros((n_max,), jnp.bool_)
    chosen = jnp.zeros((k_max,), I32)
    n1 = jnp.maximum(jnp.asarray(n, I32), 1)

    def pick(i, carry):
        rs, chosen, in_set = carry
        active0 = i < k
        rs, nxt = R.rs_randn(rs, n1, active=active0)

        def retry(_, c):
            rs, nxt, active = c
            active = jnp.logical_and(active, in_set[nxt])
            rs, nxt2 = R.rs_randn(rs, n1, active=active)
            nxt = jnp.where(active, nxt2, nxt)
            return rs, nxt, active

        rs, nxt, _ = jax.lax.fori_loop(
            0, max_tries, retry, (rs, nxt, active0)
        )
        chosen = chosen.at[i].set(jnp.where(active0, nxt, chosen[i]))
        in_set = in_set.at[nxt].set(in_set[nxt] | active0)
        return rs, chosen, in_set

    rs, chosen, _ = jax.lax.fori_loop(0, k_max, pick, (rs, chosen, in_set))
    return rs, chosen


def choose_nth_masked(mask, n):
    """Index of the n-th True in ``mask`` (ascending); mirrors indexing into
    a vector built by an ascending filter scan (e.g. get_cells_with_type)."""
    pos = jnp.cumsum(mask.astype(I32)) - 1
    return jnp.argmax(jnp.logical_and(mask, pos == n))


def partition(rs, x, n: int, x_max: int):
    """randgen.cpp:33-41: drop ``x`` balls into ``n`` buckets.  ``x`` may be
    traced (bounded by static x_max); draws are masked past x."""
    counts = jnp.zeros((n,), I32)

    def body(i, carry):
        rs, counts = carry
        active = i < x
        rs, b = R.rs_randn(rs, n, active=active)
        counts = counts.at[b].add(jnp.where(active, 1, 0))
        return rs, counts

    rs, counts = jax.lax.fori_loop(0, x_max, body, (rs, counts))
    return rs, counts


def choose_n_erase(rs, mask, k_max: int, k):
    """randgen.cpp:49-68 (choose_n) over the True positions of ``mask`` in
    ascending order: repeatedly pick a random remaining element and remove
    it.  ``k`` traced (<= k_max static).  Returns (rs, picks (k_max,), count).

    If k > popcount(mask) the reference returns all elements in order; that
    case is signalled by count == popcount."""
    size0 = jnp.sum(mask.astype(I32))
    take_all = k > size0
    count = jnp.where(take_all, size0, jnp.asarray(k, I32))

    def body(i, carry):
        rs, mask, picks = carry
        remaining = jnp.sum(mask.astype(I32))
        active = jnp.logical_and(i < count, ~take_all)
        rs, n = R.rs_randn(rs, jnp.maximum(remaining, 1), active=active)
        idx = choose_nth_masked(mask, n)
        picks = picks.at[i].set(jnp.where(active, idx, picks[i]))
        mask = mask.at[idx].set(jnp.where(active, False, mask[idx]))
        return rs, mask, picks

    picks0 = jnp.zeros((k_max,), I32)
    rs, mask2, picks = jax.lax.fori_loop(0, k_max, body, (rs, mask, picks0))
    # take-all path: elements in ascending order
    idxs = jnp.nonzero(mask, size=k_max, fill_value=0)[0].astype(I32)
    picks = jnp.where(take_all, idxs, picks)
    return rs, picks, count
