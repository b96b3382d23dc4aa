"""Block-prefetch RNG must be stream-identical to per-draw mt_raw."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen_tpu import rng as R


@pytest.mark.parametrize("warm,n_draws", [(0, 5), (0, 700), (100, 624), (620, 10), (623, 1), (0, 1248)])
def test_block_matches_direct(warm, n_draws):
    mt = R.mt_seed(jnp.asarray([42, 7]))

    @jax.jit
    def warmup(mt):
        def body(mt, _):
            mt, _x = R.mt_raw(mt)
            return mt, None
        return jax.lax.scan(body, mt, None, length=warm)[0] if warm else mt

    mt = warmup(mt)

    @jax.jit
    def direct(mt):
        def body(mt, _):
            mt, x = R.mt_raw(mt)
            return mt, x
        return jax.lax.scan(body, mt, None, length=n_draws)

    @jax.jit
    def blocked(mt):
        blk = R.mt_block_open(mt, n_draws)
        def body(blk, _):
            blk, x = R.blk_raw(blk)
            return blk, x
        blk, xs = jax.lax.scan(body, blk, None, length=n_draws)
        return R.mt_block_close(blk), xs

    mt_d, xs_d = direct(mt)
    mt_b, xs_b = blocked(mt)
    np.testing.assert_array_equal(np.asarray(xs_d), np.asarray(xs_b))
    np.testing.assert_array_equal(np.asarray(mt_d.key), np.asarray(mt_b.key))
    np.testing.assert_array_equal(np.asarray(mt_d.pos), np.asarray(mt_b.pos))


def test_block_partial_consumption_and_masks():
    mt = R.mt_seed(jnp.asarray([1, 2, 3]))
    blk = R.mt_block_open(mt, 64)
    active = jnp.asarray([True, False, True])
    for _ in range(10):
        blk, _ = R.blk_raw(blk, active=active)
    mt2 = R.mt_block_close(blk)
    # env 1 consumed nothing: state unchanged
    np.testing.assert_array_equal(np.asarray(mt2.key[1]), np.asarray(mt.key[1]))
    assert int(mt2.pos[1]) == int(mt.pos[1])
    # envs 0,2 advanced by 10: next draw matches direct path
    mt_direct = mt
    for _ in range(10):
        mt_direct, _ = R.mt_raw(mt_direct)
    _, want = R.mt_raw(mt_direct)
    _, got = R.mt_raw(mt2)
    assert int(np.asarray(got[0])) == int(np.asarray(want[0]))
    assert int(np.asarray(got[2])) == int(np.asarray(want[2]))
    assert not bool(R.blk_overflowed(blk).any())
