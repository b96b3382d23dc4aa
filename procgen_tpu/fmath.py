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

import jax
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


def wide(cfg, x):
    """Promote a C++ ``float`` operand to double for a parity-mode mixed
    expression (e.g. support probes ``x - (rx - .01)``, ninja.cpp:358-359,
    where the double literal promotes the chain).  Identity f32 cast on the
    fast path."""
    x = jnp.asarray(x, F32)
    return x.astype(jnp.float64) if cfg.parity_mode else x


def narrow(x):
    """Round a (possibly f64) expression result back to the C++ float."""
    return jnp.asarray(x).astype(F32)


def fdiv(cfg, a, b):
    """IEEE-correctly-rounded float32 division.

    XLA's CPU backend lowers f32 division to a reciprocal refinement that is
    1 ulp off IEEE in some cases (measured: 0.5/float32(30/22)); the C++
    reference uses hardware-rounded ``float`` division.  In parity mode,
    divide in f64 and narrow (exact f32 rounding except vanishingly rare
    double-rounding ties); plain f32 divide on the fast path."""
    if cfg.parity_mode:
        a64 = jnp.asarray(a, F32).astype(jnp.float64)
        b64 = jnp.asarray(b, F32).astype(jnp.float64)
        return (a64 / b64).astype(F32)
    return jnp.asarray(a, F32) / jnp.asarray(b, F32)


def seq(cfg, x):
    """Pin the f32 rounding of an intermediate in a constant chain.

    XLA's algebraic simplifier reassociates ``x - c1 + c2`` into
    ``x + (c2 - c1)``, changing the rounding vs the reference's
    left-to-right float evaluation; an optimization_barrier around the
    intermediate blocks the fold.  Identity on the fast path."""
    if cfg.parity_mode:
        return jax.lax.optimization_barrier(x)
    return x


def dmuladd(cfg, a, c, b):
    """float32( float(b) + c * double(a) ) with double intermediates -- the
    shape of ``float x = b + .2 * rand01()`` where the double literal promotes
    the whole expression (e.g. fruitbot.cpp:170).  ``b`` is a C++ float
    (rounded to f32 before the promotion), ``c`` the double literal."""
    if cfg.parity_mode:
        a64 = jnp.asarray(a).astype(jnp.float64)
        b64 = jnp.asarray(b, F32).astype(jnp.float64)
        return (b64 + float(c) * a64).astype(F32)
    return F32(b) + F32(c) * jnp.asarray(a, F32)


def fsign(x):
    """cpp-utils.h:42-44 ``sign()``: +1 / 0 / -1, where the 0 branch covers
    BOTH IEEE zeros and returns +0.0.  ``jnp.sign`` instead propagates -0.0,
    which diverges from the reference whenever sign() feeds a float chain
    (chaser's velocity re-normalization, chaser.cpp:85-86)."""
    return jnp.where(
        x > 0, jnp.float32(1.0), jnp.where(x == 0, jnp.float32(0.0), jnp.float32(-1.0))
    )


def face_rotation(cfg, dx, dy, offset=0.0):
    """Entity::face_direction (entity.cpp:84-88):

        rotation = -1 * atan2(dy, dx) + rotation_offset

    ``atan2`` is the double overload (float args promote), the negation and
    offset-add stay double, and the result narrows on assignment to the
    float ``rotation`` member.  ``offset`` is the f32 parameter value.  The
    caller must apply the "only when dx != 0 or dy != 0" guard."""
    off = F32(offset)
    if cfg.parity_mode:
        r = -jnp.arctan2(
            jnp.asarray(dy, F32).astype(jnp.float64),
            jnp.asarray(dx, F32).astype(jnp.float64),
        ) + off.astype(jnp.float64)
        return r.astype(F32)
    return -jnp.arctan2(jnp.asarray(dy, F32), jnp.asarray(dx, F32)) + off


def dcos(cfg, x):
    """C++ ``cos(float)``: the double overload.  Returns f64 in parity mode
    (caller narrows at the assignment), f32 on the fast path."""
    x = jnp.asarray(x, F32)
    return jnp.cos(x.astype(jnp.float64)) if cfg.parity_mode else jnp.cos(x)


def dsin(cfg, x):
    x = jnp.asarray(x, F32)
    return jnp.sin(x.astype(jnp.float64)) if cfg.parity_mode else jnp.sin(x)


def dsqrt(cfg, x):
    """C++ ``sqrt(float)``: the double overload of an f32 operand."""
    x = jnp.asarray(x, F32)
    return jnp.sqrt(x.astype(jnp.float64)) if cfg.parity_mode else jnp.sqrt(x)
