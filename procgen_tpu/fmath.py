"""Float-arithmetic parity helpers.

The reference is C++ with ``float`` storage but several expressions mix in
``double`` literals (e.g. ``agent->vx = .9 * agent->vx``,
basic-abstract-game.cpp:682-684), which promotes to double and narrows on
assignment.  That double-rounding differs from pure float32 math (float32(0.9)
!= 0.9), so bit-exact trajectory parity needs f64 emulation at those sites.

``dmul``/``dadd`` compute in f64 and narrow when ``cfg.parity_mode`` is set
(CPU tests with jax_enable_x64), and in plain f32 on the fast TPU path.
"""

from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32


def dmul(cfg, a, c):
    """float32( double(a) * c ) in parity mode; float32 multiply otherwise."""
    if cfg.parity_mode:
        return (jnp.asarray(a).astype(jnp.float64) * float(c)).astype(F32)
    return jnp.asarray(a, F32) * F32(c)


def dadd(cfg, a, c):
    if cfg.parity_mode:
        return (jnp.asarray(a).astype(jnp.float64) + float(c)).astype(F32)
    return jnp.asarray(a, F32) + F32(c)
