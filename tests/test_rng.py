"""Conformance tests: procgen_tpu.rng vs libstdc++ std::mt19937."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from procgen_tpu import rng as R


def test_host_mt_matches_cpp(mt_oracle):
    ref = mt_oracle(seed=12345, n=1400)  # spans >2 twists
    h = R.HostMT(12345)
    got = [h.raw() for _ in range(1400)]
    assert got == ref["raw"]


@pytest.mark.parametrize("seed", [0, 1, 23, 12345, 2**31 - 1, -7])
def test_jax_raw_stream_matches_cpp(mt_oracle, seed):
    n = 700  # crosses the first twist boundary
    ref = mt_oracle(seed=seed, n=n)
    mt = R.mt_seed(jnp.asarray([seed], dtype=jnp.int32))

    @jax.jit
    def draw_many(mt):
        def body(mt, _):
            mt, x = R.mt_raw(mt)
            return mt, x

        return jax.lax.scan(body, mt, None, length=n)

    _, xs = draw_many(mt)
    got = np.asarray(xs)[:, 0].astype(np.uint32).tolist()
    assert got == ref["raw"]


def test_jax_derived_values_match_cpp(mt_oracle):
    n = 650
    ref = mt_oracle(seed=99, n=n)
    mt = R.mt_seed(jnp.asarray([99]))

    @jax.jit
    def run(mt):
        def body(carry, _):
            mt_i, mt_f, mt_r = carry
            mt_i, vi = R.mt_randint(mt_i, 3, 17)
            mt_f, vf = R.mt_rand01(mt_f)
            mt_r, vr = R.mt_randint_full(mt_r)
            return (mt_i, mt_f, mt_r), (vi, vf, vr)

        return jax.lax.scan(body, (mt, mt, mt), None, length=n)

    _, (vi, vf, vr) = run(mt)
    assert np.asarray(vi)[:, 0].tolist() == ref["randint"]
    assert np.asarray(vf)[:, 0].view(np.uint32).tolist() == ref["rand01"]
    assert np.asarray(vr)[:, 0].tolist() == ref["randfull"]


def test_batched_streams_are_independent():
    seeds = jnp.asarray([5, 6, 7, 8])
    mt = R.mt_seed(seeds)

    @jax.jit
    def run(mt):
        def body(mt, _):
            mt, x = R.mt_raw(mt)
            return mt, x

        return jax.lax.scan(body, mt, None, length=10)

    _, xs = run(mt)
    batch = np.asarray(xs).T  # (4, 10)
    for i, s in enumerate([5, 6, 7, 8]):
        h = R.HostMT(s)
        expect = [h.raw() for _ in range(10)]
        assert batch[i].astype(np.uint32).tolist() == expect


def test_active_mask_freezes_inactive_streams():
    mt = R.mt_seed(jnp.asarray([11, 22]))
    active = jnp.asarray([True, False])
    mt2 = mt
    for _ in range(5):
        mt2, _ = R.mt_raw(mt2, active=active)
    # stream 1 untouched
    np.testing.assert_array_equal(np.asarray(mt2.key[1]), np.asarray(mt.key[1]))
    assert int(mt2.pos[1]) == int(mt.pos[1])
    # stream 0 advanced by 5 and matches the unmasked stream
    h = R.HostMT(11)
    expect = [h.raw() for _ in range(6)]
    mt3, x = R.mt_raw(mt2, active=active)
    assert int(np.uint32(np.asarray(x)[0])) == expect[5]


def test_mask_straddles_twist_boundary():
    """An inactive stream sitting exactly at pos=624 must not twist."""
    mt = R.mt_seed(jnp.asarray([3, 4]))  # both start at pos=624
    active = jnp.asarray([True, False])
    mt2, _ = R.mt_raw(mt, active=active)
    assert int(mt2.pos[0]) == 1
    assert int(mt2.pos[1]) == 624
    np.testing.assert_array_equal(np.asarray(mt2.key[1]), np.asarray(mt.key[1]))
    # stream 1 then produces the correct first value when activated
    mt3, x = R.mt_raw(mt2)
    h = R.HostMT(4)
    assert int(np.uint32(np.asarray(x)[1])) == h.raw()


def test_randrange_randbool_semantics():
    h = R.HostMT(77)
    mt = R.mt_seed(jnp.asarray([77]))

    @jax.jit
    def run(mt):
        def body(mt, _):
            mt, v = R.mt_randrange(mt, 1.5, 9.25)
            return mt, v

        return jax.lax.scan(body, mt, None, length=40)

    _, vs = run(mt)
    for v in np.asarray(vs)[:, 0]:
        assert np.float32(v) == h.randrange(1.5, 9.25)
