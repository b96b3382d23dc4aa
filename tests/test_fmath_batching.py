"""fmath host-callback batching under vmap with MIXED batched/unbatched
operands.

Round-4 regression (VERDICT r4 weak #2): ``vmap_method="expand_dims"`` kept
rank differences between batched and unbatched args, so numpy's
right-aligned broadcast crashed with e.g. (1,8) vs (2,) inside bossfight's
parity run.  These tests vmap every callback-backed fmath op over each
combination of scalar/vector operands.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen_tpu import fmath
from procgen_tpu.config import EnvConfig

jax.config.update("jax_enable_x64", True)

CFG = EnvConfig(env_name="maze", num_envs=1, parity_mode=True)


def _vec(n, lo=-2.0, hi=2.0):
    return jnp.linspace(lo, hi, n, dtype=jnp.float32)


BATCH = 3


@pytest.mark.parametrize("shapes", [
    # (r, scale, off): which operands are batched (B=batched over BATCH,
    # s=unbatched scalar, v=unbatched vector of length 8)
    ("B", "s", "s"),
    ("s", "B", "s"),
    ("s", "s", "B"),
    ("B", "v", "s"),
    ("v", "B", "s"),
    ("s", "v", "B"),
    ("B", "B", "v"),
    ("v", "v", "B"),
])
def test_fmuladd32_vmap_mixed(shapes):
    operands, in_axes = [], []
    for i, kind in enumerate(shapes):
        if kind == "B":
            operands.append(_vec(BATCH, lo=-1.0 + i, hi=1.0 + i))
            in_axes.append(0)
        elif kind == "v":
            operands.append(_vec(8, lo=0.1, hi=1.7))
            in_axes.append(None)
        else:
            operands.append(jnp.float32(0.7 + i))
            in_axes.append(None)

    fn = jax.vmap(
        lambda r, s, o: fmath.fmuladd32(CFG, r, s, o), in_axes=tuple(in_axes)
    )
    got = np.asarray(fn(*operands))

    # oracle: two separate IEEE f32 roundings, per batch element
    r, s, o = [np.asarray(x, np.float32) for x in operands]
    for b in range(BATCH):
        rb = r[b] if shapes[0] == "B" else r
        sb = s[b] if shapes[1] == "B" else s
        ob = o[b] if shapes[2] == "B" else o
        want = (np.float32(rb) * np.float32(sb)).astype(np.float32) + ob
        np.testing.assert_array_equal(got[b], np.broadcast_to(want, got[b].shape))


@pytest.mark.parametrize("ax", [(0, None), (None, 0), (0, 0)])
def test_fadd32_vmap_mixed(ax):
    a = _vec(BATCH) if ax[0] == 0 else _vec(8)
    b = _vec(BATCH, lo=0.3, hi=2.3) if ax[1] == 0 else jnp.float32(0.25)
    got = jax.vmap(lambda x, y: fmath.fadd32(CFG, x, y), in_axes=ax)(a, b)
    assert got.shape[0] == BATCH
    jax.block_until_ready(got)


@pytest.mark.parametrize("ax", [(0, None), (None, 0), (0, 0)])
def test_atan2f_vmap_mixed(ax):
    y = _vec(BATCH) if ax[0] == 0 else _vec(8)
    x = _vec(BATCH, lo=0.5, hi=1.5) if ax[1] == 0 else jnp.float32(1.0)
    got = jax.vmap(lambda a, b: fmath.atan2f(CFG, a, b), in_axes=ax)(y, x)
    assert got.shape[0] == BATCH
    jax.block_until_ready(got)


@pytest.mark.parametrize("op", ["cosf", "sinf"])
def test_unary_libm_vmap(op):
    fn = getattr(fmath, op)
    got = jax.vmap(lambda x: fn(CFG, x))(_vec(BATCH))
    assert got.shape == (BATCH,)
    jax.block_until_ready(got)


def test_nested_vmap_fmuladd():
    """Double-vmap (env x entity) with the inner operand unbatched — the
    exact structure of bossfight's shields chain at env.py:206."""
    r = jnp.arange(2 * 8, dtype=jnp.float32).reshape(2, 8) / 7.0
    scale = jnp.float32(0.55)
    off = _vec(2)  # batched on the OUTER axis only
    fn = jax.vmap(
        jax.vmap(lambda rr, oo: fmath.fmuladd32(CFG, rr, scale, oo),
                 in_axes=(0, None)),
        in_axes=(0, 0),
    )
    got = fn(r, off)
    assert got.shape == (2, 8)
    want = (np.asarray(r) * np.float32(0.55)).astype(np.float32) + np.asarray(
        off
    )[:, None]
    np.testing.assert_array_equal(np.asarray(got), want)
