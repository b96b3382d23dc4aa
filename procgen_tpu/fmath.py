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


def fmuladd32(cfg, r, scale, off):
    """``r * scale + off`` with SEPARATE f32 roundings.

    The reference is compiled for ivybridge (no FMA), so the multiply and
    the add round separately; XLA's CPU backend contracts a single-use f32
    mul+add into fmuladd.  In parity mode the add runs in f64 and narrows:
    for two f32 operands that is exactly the correctly-rounded f32 add (one
    rounding from exact operands), and a mixed-precision mul+add cannot be
    contracted.  Plain f32 on the fast path."""
    r = jnp.asarray(r, F32)
    scale = jnp.asarray(scale, F32)
    off = jnp.asarray(off, F32)
    if cfg.parity_mode:
        # LLVM contracts the mul+add inside an XLA:CPU fusion even across
        # an optimization_barrier and an f64 convert (measured: bossfight
        # barrier x fused, 1 ulp off); the host-numpy callback performs
        # the two IEEE f32 roundings the ivybridge reference build does.
        # Operands are pre-broadcast to one shape so vmap with mixed
        # batched/unbatched operands stays rank-consistent.
        r, scale, off = jnp.broadcast_arrays(r, scale, off)
        return _callback(_np_fmuladd, r, r, scale, off)
    return r * scale + off


def fadd32(cfg, a, b):
    """``a + b`` where both operands are f32 products whose roundings must
    be pinned (no FMA contraction of either multiply into the add).  In
    parity mode the add is routed through a host pure_callback so LLVM
    cannot contract either operand's multiply into an FMA; the host numpy
    add is the single IEEE f32 rounding the ivybridge reference build
    performs.  Plain add on the fast path."""
    a = jnp.asarray(a, F32)
    b = jnp.asarray(b, F32)
    if cfg.parity_mode:
        a, b = jnp.broadcast_arrays(a, b)
        return _callback(_np_fadd, a, a, b)
    return a + b


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

    ``atan2`` resolves to the FLOAT overload (entity.cpp includes <math.h>,
    which in C++ provides the float overloads), so the whole chain is f32:
    atan2f, f32 negate, f32 add.  ``offset`` is the f32 parameter value.
    The caller must apply the "only when dx != 0 or dy != 0" guard."""
    off = F32(offset)
    if cfg.parity_mode:
        # IEEE "+ 0.0" turns a -0.0 atan2 result into +0.0 (the reference
        # stores +0.0); XLA's simplifier folds add-of-literal-zero away,
        # which would leak the -0.0 -- pin the constant behind a barrier.
        off = jax.lax.optimization_barrier(off)
    return -atan2f(cfg, dy, dx) + off


_LIBM = None


def _libm():
    """The host C library's libm — the exact float-precision functions the
    reference binary links against.  The reference's C++ TUs include
    <math.h>/<cmath>, so ``atan2(float, float)`` / ``cos(float)`` resolve to
    the FLOAT overloads (atan2f/cosf/sinf).  glibc's float trig is NOT the
    correctly-rounded narrow-of-double (measured on glibc 2.36: atan2f
    differs from float(atan2(double)) on ~16% of inputs), so bit-parity
    requires calling the very same libm the refdump binary used."""
    global _LIBM
    if _LIBM is None:
        import ctypes

        lib = ctypes.CDLL("libm.so.6")
        for name in ("sinf", "cosf", "atan2f"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_float
            fn.argtypes = [ctypes.c_float] * (2 if name == "atan2f" else 1)
        _LIBM = lib
    return _LIBM


def _np_unary_libm(name):
    import ctypes

    import numpy as np

    def run(x):
        lib = _libm()
        fn = getattr(lib, name)
        x = np.asarray(x, np.float32)
        out = np.empty(x.shape, np.float32)
        of, xf = out.ravel(), x.ravel()
        for i in range(xf.size):
            of[i] = fn(ctypes.c_float(float(xf[i])))
        return out

    return run


def _np_atan2f(y, x):
    import ctypes

    import numpy as np

    lib = _libm()
    y = np.asarray(y, np.float32)
    x = np.asarray(x, np.float32)
    y, x = np.broadcast_arrays(y, x)
    out = np.empty(y.shape, np.float32)
    of, yf, xf = out.ravel(), y.ravel(), x.ravel()
    for i in range(yf.size):
        of[i] = lib.atan2f(
            ctypes.c_float(float(yf[i])), ctypes.c_float(float(xf[i]))
        )
    return out


def _np_fmuladd(r, s, o):
    import numpy as np

    r, s, o = np.broadcast_arrays(
        np.asarray(r, np.float32), np.asarray(s, np.float32),
        np.asarray(o, np.float32),
    )
    return (r * s).astype(np.float32) + o


def _np_fadd(a, b):
    import numpy as np

    a, b = np.broadcast_arrays(
        np.asarray(a, np.float32), np.asarray(b, np.float32)
    )
    return a + b


def _callback(fn, out_like, *args):
    """Host callback with batching that survives vmap over MIXED
    batched/unbatched operands.

    ``expand_dims`` kept rank differences between batched and unbatched
    args, which made numpy's right-aligned broadcast fail (e.g. (1,8) vs
    (2,) in bossfight's parity run — VERDICT r4).  Callers pre-broadcast
    all operands to one core shape and ``broadcast_all`` then gives every
    argument identical batch dims, so the host fn always sees equal
    shapes."""
    import jax

    return jax.pure_callback(
        fn,
        jax.ShapeDtypeStruct(jnp.shape(out_like), F32),
        *args,
        vmap_method="broadcast_all",
    )


def cosf(cfg, x):
    """C++ ``cos(float)`` — the FLOAT overload (glibc cosf), bit-exact via
    the host libm in parity mode; plain f32 cos on the fast path."""
    x = jnp.asarray(x, F32)
    if cfg.parity_mode:
        return _callback(_np_unary_libm("cosf"), x, x)
    return jnp.cos(x)


def sinf(cfg, x):
    x = jnp.asarray(x, F32)
    if cfg.parity_mode:
        return _callback(_np_unary_libm("sinf"), x, x)
    return jnp.sin(x)


def atan2f(cfg, y, x):
    """C++ ``atan2(float, float)`` — the FLOAT overload (glibc atan2f)."""
    y = jnp.asarray(y, F32)
    x = jnp.asarray(x, F32)
    y, x = jnp.broadcast_arrays(y, x)
    if cfg.parity_mode:
        return _callback(_np_atan2f, y, y, x)
    return jnp.arctan2(y, x)


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
