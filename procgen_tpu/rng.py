"""Bit-exact, batch-vectorized MT19937 for TPU.

The reference environment's determinism backbone is ``std::mt19937`` wrapped by
``RandGen`` (reference: procgen/src/randgen.{h,cpp}).  Every piece of level
generation and per-step randomness consumes that stream, so trajectory parity
requires reproducing the exact 32-bit output sequence *and* the exact
derivations (``randint`` = modulo, ``rand01`` = double division, ...).

TPU-native design
-----------------
Instead of one generator object per env, the generator state is a pytree of
arrays with a leading batch axis:

  * ``key``  -- uint32[..., 624]   the raw Mersenne state words
  * ``pos``  -- int32[...]         next word to read (624 == twist required)

All operations are pure functions ``(MT, ...) -> (MT, value)`` and every one is
vectorized over arbitrary leading batch dims, so a whole fleet of envs advances
its RNG in lockstep inside one ``jit``.  Because different envs consume
different numbers of draws (rejection sampling in level generation), each draw
accepts an ``active`` mask: inactive envs produce a (discarded) value without
advancing their state.

The temper/twist steps are pure uint32 vector ops (VPU friendly).  The twist is
formulated as four chunked vector operations instead of the sequential C loop
(the in-place recurrence only feeds back with lag 227, so chunks
[0,227), [227,454), [454,623), {623} resolve the dependency).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

N = 624
M = 397
MATRIX_A = np.uint32(0x9908B0DF)
UPPER_MASK = np.uint32(0x80000000)
LOWER_MASK = np.uint32(0x7FFFFFFF)
SEED_MULT = np.uint32(1812433253)
TEMPER_B = np.uint32(0x9D2C5680)
TEMPER_C = np.uint32(0xEFC60000)

# float(2**-32): scaling a uint32 by an exact power of two commutes with
# rounding, so float32(x) * 2^-32 equals float32(double(x) / 2^32), which is
# the exact expression used by RandGen::rand01 (randgen.cpp:19-23).
_INV_2_32 = np.float32(2.0**-32)


class MT(NamedTuple):
    """Batched MT19937 state; a pytree with leading batch dims on both leaves."""

    key: jax.Array  # uint32[..., 624]
    pos: jax.Array  # int32[...]

    @property
    def batch_shape(self):
        return self.pos.shape


def mt_seed(seed: jax.Array) -> MT:
    """Equivalent of ``std::mt19937::seed`` for a batch of seeds.

    ``seed`` may have any shape/int dtype; each element seeds one stream.
    Matches randgen.cpp:95-98 (which forwards to the standard seeding
    recurrence mt[i] = 1812433253 * (mt[i-1] ^ (mt[i-1] >> 30)) + i).
    """
    seed = jnp.asarray(seed)
    s0 = seed.astype(jnp.uint32)

    def body(carry, i):
        nxt = SEED_MULT * (carry ^ (carry >> np.uint32(30))) + i.astype(jnp.uint32)
        return nxt, nxt

    idx = jnp.arange(1, N, dtype=jnp.uint32)
    _, rest = jax.lax.scan(body, s0, idx)
    # scan stacks on axis 0; move the 623-word axis to the end.
    rest = jnp.moveaxis(rest, 0, -1)
    key = jnp.concatenate([s0[..., None], rest], axis=-1)
    pos = jnp.full(seed.shape, N, dtype=jnp.int32)
    return MT(key=key, pos=pos)


def _twist(key: jax.Array) -> jax.Array:
    """One full MT19937 twist over the trailing 624-word axis (vectorized)."""
    nxt = jnp.roll(key, -1, axis=-1)  # key[(i+1) % 624]; slot 623 fixed below
    y = (key & UPPER_MASK) | (nxt & LOWER_MASK)
    base = (y >> np.uint32(1)) ^ jnp.where(
        (y & np.uint32(1)).astype(bool), MATRIX_A, np.uint32(0)
    )
    # new[i] = src[i] ^ base[i]; src = old[i+397] for i<227, new[i-227] after.
    new_a = key[..., M:N] ^ base[..., 0 : N - M]  # i in [0, 227)
    new_b = new_a[..., 0 : N - M] ^ base[..., N - M : 2 * (N - M)]  # [227, 454)
    new_c = new_b[..., 0 : N - 1 - 2 * (N - M)] ^ base[..., 2 * (N - M) : N - 1]
    # i = 623: y uses the *new* word 0 (the C loop already overwrote mt[0]).
    y_last = (key[..., N - 1] & UPPER_MASK) | (new_a[..., 0] & LOWER_MASK)
    base_last = (y_last >> np.uint32(1)) ^ jnp.where(
        (y_last & np.uint32(1)).astype(bool), MATRIX_A, np.uint32(0)
    )
    # (623+397) % 624 = 396 -> new[396] = new_b[169]
    new_last = new_b[..., M - 1 - (N - M)] ^ base_last
    return jnp.concatenate([new_a, new_b, new_c, new_last[..., None]], axis=-1)


def _temper(y: jax.Array) -> jax.Array:
    y = y ^ (y >> np.uint32(11))
    y = y ^ ((y << np.uint32(7)) & TEMPER_B)
    y = y ^ ((y << np.uint32(15)) & TEMPER_C)
    y = y ^ (y >> np.uint32(18))
    return y


def mt_raw(mt: MT, active: Optional[jax.Array] = None) -> tuple[MT, jax.Array]:
    """Draw one raw uint32 per stream (``stdgen()``).

    ``active``: optional bool mask over the batch; inactive streams neither
    twist nor advance, and their returned value must be ignored.
    """
    needs = mt.pos >= N
    any_needs = jnp.any(needs) if needs.ndim else needs
    if active is not None:
        any_needs = jnp.any(jnp.logical_and(needs, active))

    def do_twist(key):
        twisted = _twist(key)
        sel = needs if active is None else jnp.logical_and(needs, active)
        return jnp.where(sel[..., None], twisted, key)

    key = jax.lax.cond(any_needs, do_twist, lambda k: k, mt.key)
    pos = jnp.where(needs, 0, mt.pos)
    word = jnp.take_along_axis(key, pos[..., None].astype(jnp.int32), axis=-1)[..., 0]
    out = _temper(word)
    new_pos = pos + 1
    if active is not None:
        key = jnp.where(active[..., None], key, mt.key)
        new_pos = jnp.where(active, new_pos, mt.pos)
    return MT(key=key, pos=new_pos), out


def mt_randint(mt: MT, low, high, active=None) -> tuple[MT, jax.Array]:
    """``RandGen::randint(low, high)`` = low + x % uint32(high - low)."""
    mt, x = mt_raw(mt, active)
    low = jnp.asarray(low, jnp.int32)
    high = jnp.asarray(high, jnp.int32)
    rng_range = (high - low).astype(jnp.uint32)
    return mt, (low + (x % rng_range).astype(jnp.int32)).astype(jnp.int32)


def mt_randn(mt: MT, high, active=None) -> tuple[MT, jax.Array]:
    """``RandGen::randn(high)`` = x % uint32(high)."""
    mt, x = mt_raw(mt, active)
    high_u = jnp.asarray(high, jnp.int32).astype(jnp.uint32)
    return mt, (x % high_u).astype(jnp.int32)


def mt_randint_full(mt: MT, active=None) -> tuple[MT, jax.Array]:
    """``RandGen::randint()`` = int(stdgen()) -- full-width, possibly negative."""
    mt, x = mt_raw(mt, active)
    return mt, x.astype(jnp.int32)


def mt_rand01(mt: MT, active=None) -> tuple[MT, jax.Array]:
    """``RandGen::rand01`` = float(double(x) / 2^32) as float32 (exact)."""
    mt, x = mt_raw(mt, active)
    return mt, x.astype(jnp.float32) * _INV_2_32


def mt_randbool(mt: MT, active=None) -> tuple[MT, jax.Array]:
    mt, r = mt_rand01(mt, active)
    return mt, r > jnp.float32(0.5)


def _randrange_value(r, low, high):
    """rand01() * (high - low) + low with *separate* float32 roundings.

    The reference is compiled for ivybridge (no FMA, CMakeLists.txt:30), so
    the multiply and add must round separately.  XLA's optimization_barrier
    does not survive CPU codegen (LLVM contracts mul+add inside a fusion into
    fmuladd), but LLVM only forms fmuladd when the multiply has a single use
    -- so the select below, whose predicate r >= 0 is data-dependent yet
    always true, keeps a second live use of the product and pins the unfused
    rounding (regression-tested against libstdc++/no-FMA in test_rng.py)."""
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)
    prod = r * (high - low)
    v = prod + low
    # r is in [0, 1), so the predicate always holds, but XLA cannot prove it
    # (unlike r >= 0, which its range analysis folds away).
    return jnp.where(r != jnp.float32(2.0), v, prod)


def mt_randrange(mt: MT, low, high, active=None) -> tuple[MT, jax.Array]:
    """``RandGen::randrange`` (randgen.cpp:29-31)."""
    mt, r = mt_rand01(mt, active)
    return mt, _randrange_value(r, low, high)


# ---------------------------------------------------------------------------
# Block-prefetch API: for draw-heavy sections (level generation).
#
# Opening a block materializes the twist chain once and tempers a window of
# up to ``max_draws`` upcoming outputs; draws then cost one tiny gather and a
# masked cursor bump (no per-draw conditional twist over the whole batch).
# Closing commits the consumed count back into an exact MT state, so the
# stream is bit-identical to calling mt_raw() the same number of times.
# ---------------------------------------------------------------------------


class MTBlock(NamedTuple):
    vals: jax.Array  # uint32[..., M] tempered outputs at offsets 0..M-1
    cursor: jax.Array  # int32[...] consumed draws
    keys: jax.Array  # uint32[..., T, 624] twist chain (keys[0] = entry key)
    pos: jax.Array  # int32[...] entry position


def mt_block_open(mt: MT, max_draws: int) -> MTBlock:
    """Prefetch up to ``max_draws`` outputs (exact window of the stream)."""
    n_chain = (624 + max_draws - 1) // 624 + 1  # keys needed incl. entry
    chain = [mt.key]
    for _ in range(n_chain - 1):
        chain.append(_twist(chain[-1]))
    keys = jnp.stack(chain, axis=-2)  # (..., T, 624)
    flat = _temper(keys.reshape(keys.shape[:-2] + (n_chain * 624,)))
    idx = mt.pos[..., None] + jnp.arange(max_draws, dtype=jnp.int32)
    vals = jnp.take_along_axis(flat, idx, axis=-1)
    return MTBlock(
        vals=vals,
        cursor=jnp.zeros_like(mt.pos),
        keys=keys,
        pos=mt.pos,
    )


def mt_block_close(blk: MTBlock) -> MT:
    """Commit the cursor: the returned MT equals drawing ``cursor`` times."""
    total = blk.pos + blk.cursor
    crossed = jnp.where(blk.cursor > 0, (total - 1) // N, 0)
    new_pos = total - crossed * N
    new_key = jnp.take_along_axis(
        blk.keys, crossed[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    return MT(key=new_key, pos=new_pos)


def blk_raw(blk: MTBlock, active=None) -> tuple[MTBlock, jax.Array]:
    cur = jnp.minimum(blk.cursor, blk.vals.shape[-1] - 1)
    v = jnp.take_along_axis(blk.vals, cur[..., None], axis=-1)[..., 0]
    inc = jnp.asarray(1, jnp.int32) if active is None else jnp.asarray(
        active, jnp.int32
    )
    return blk._replace(cursor=blk.cursor + inc), v


def blk_raw_vec(blk: MTBlock, k: int) -> tuple[MTBlock, jax.Array]:
    """Draw ``k`` consecutive raw outputs at once (static k); one dynamic
    slice instead of k cursor bumps.  Used by bulk levelgen passes (e.g.
    caveflyer's per-cell noise, caveflyer.cpp:152-158)."""
    start = jnp.clip(blk.cursor, 0, max(blk.vals.shape[-1] - k, 0))
    v = jax.lax.dynamic_slice_in_dim(blk.vals, start, k, axis=-1)
    return blk._replace(cursor=blk.cursor + k), v


def rs_rand01_vec(rs, k: int):
    """k consecutive rand01 draws from an open block."""
    rs, x = blk_raw_vec(rs, k)
    return rs, x.astype(jnp.float32) * _INV_2_32


def blk_overflowed(blk: MTBlock) -> jax.Array:
    """True where more draws were consumed than prefetched (stream would be
    wrong; sized per game so this cannot happen in-distribution)."""
    return blk.cursor > blk.vals.shape[-1]


# ---------------------------------------------------------------------------
# Generic draw-source dispatch: levelgen/step code draws through rs_* and
# works with either a raw MT state or an open MTBlock.
# ---------------------------------------------------------------------------


def rs_raw(rs, active=None):
    if isinstance(rs, MTBlock):
        return blk_raw(rs, active)
    return mt_raw(rs, active)


def rs_randint(rs, low, high, active=None):
    rs, x = rs_raw(rs, active)
    low = jnp.asarray(low, jnp.int32)
    high = jnp.asarray(high, jnp.int32)
    rng_range = (high - low).astype(jnp.uint32)
    return rs, (low + (x % rng_range).astype(jnp.int32)).astype(jnp.int32)


def rs_randn(rs, high, active=None):
    rs, x = rs_raw(rs, active)
    high_u = jnp.asarray(high, jnp.int32).astype(jnp.uint32)
    return rs, (x % high_u).astype(jnp.int32)


def rs_randint_full(rs, active=None):
    rs, x = rs_raw(rs, active)
    return rs, x.astype(jnp.int32)


def rs_rand01(rs, active=None):
    rs, x = rs_raw(rs, active)
    return rs, x.astype(jnp.float32) * _INV_2_32


def rs_randbool(rs, active=None):
    rs, r = rs_rand01(rs, active)
    return rs, r > jnp.float32(0.5)


def rs_randrange(rs, low, high, active=None):
    rs, r = rs_rand01(rs, active)
    return rs, _randrange_value(r, low, high)


def mt_select(pred: jax.Array, a: MT, b: MT) -> MT:
    """Per-stream select between two MT states (pred over the batch shape)."""
    return MT(
        key=jnp.where(pred[..., None], a.key, b.key),
        pos=jnp.where(pred, a.pos, b.pos),
    )


# ---------------------------------------------------------------------------
# Host-side reference (numpy, scalar) -- used by tests and offline tools.
# ---------------------------------------------------------------------------


class HostMT:
    """Plain-numpy scalar MT19937, same semantics, for oracles and tooling."""

    def __init__(self, seed: int):
        self.mt = np.zeros(N, dtype=np.uint32)
        self.seed(seed)

    def seed(self, seed: int) -> None:
        self.mt[0] = np.uint32(seed & 0xFFFFFFFF)
        for i in range(1, N):
            prev = int(self.mt[i - 1])
            self.mt[i] = np.uint32(
                (int(SEED_MULT) * (prev ^ (prev >> 30)) + i) & 0xFFFFFFFF
            )
        self.pos = N

    def _twist(self) -> None:
        mt = self.mt
        for i in range(N):
            y = (mt[i] & UPPER_MASK) | (mt[(i + 1) % N] & LOWER_MASK)
            mt[i] = mt[(i + M) % N] ^ (y >> np.uint32(1)) ^ (
                MATRIX_A if (y & np.uint32(1)) else np.uint32(0)
            )
        self.pos = 0

    def raw(self) -> int:
        if self.pos >= N:
            self._twist()
        y = self.mt[self.pos]
        self.pos += 1
        y ^= y >> np.uint32(11)
        y = y ^ ((y << np.uint32(7)) & TEMPER_B)
        y = y ^ ((y << np.uint32(15)) & TEMPER_C)
        y ^= y >> np.uint32(18)
        return int(y)

    def randint(self, low: int, high: int) -> int:
        return low + int(np.uint32(self.raw()) % np.uint32(high - low))

    def randn(self, high: int) -> int:
        return int(np.uint32(self.raw()) % np.uint32(high))

    def randint_full(self) -> int:
        return int(np.int32(np.uint32(self.raw())))

    def rand01(self) -> np.float32:
        return np.float32(np.float64(self.raw()) / np.float64(2**32))

    def randbool(self) -> bool:
        return bool(self.rand01() > np.float32(0.5))

    def randrange(self, low: float, high: float) -> np.float32:
        return np.float32(
            self.rand01() * (np.float32(high) - np.float32(low)) + np.float32(low)
        )
