"""Pallas TPU sprite compositor: the hot half of the batched renderer.

Design: the XLA einsum compositor (fast2.composite_entities) materializes
full-frame matmul intermediates per draw; this kernel instead keeps the
canvas and sampling intermediates in VMEM, building nearest-sample one-hot
matrices on the VPU and running the two sampling contractions as
env-batched MXU matmuls, blending in registers.

MEASURED (r4, v5e, maze 8192 envs, end-to-end steps/s): einsum 261k,
this kernel 159k -- the per-chunk HBM texture-select intermediate plus
small per-block matmul shapes lose to XLA's fused einsum pipeline, so the
kernel is OPT-IN (PROCGEN_TPU_PALLAS=1; see fast2._use_pallas).  Output is
bit-identical to the einsum path (tests/test_render_paths.py on CPU
interpret mode, tools/tpu_render_check.py on hardware).

Layout: the kernel works on a PLANAR canvas (N, 4, 64, 64) f32 (rgb + a
scratch plane); interleaved (N, 64, 64, 3) frames are transposed at entry
and exit by the XLA caller (fast2.render_frames2).

The per-(env, entity) texture block (``texsel``: (N, CAP, 4, R, R) bf16,
premultiplied alpha) is selected OUTSIDE the kernel with a one-hot matmul
against the variant atlas: Mosaic cannot reshape a (BN, R*R) matmul result
into (BN, R, R), so in-kernel selection is not expressible; the selected
block is the one remaining HBM intermediate.

Entity slots are processed in chunks of ``CAP``; each chunk is gated by a
scalar ``lax.cond`` on kmax (records are z-sorted, non-drawable last), so
games with large entity tables only pay for alive slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RES = 64
F32 = jnp.float32
I32 = jnp.int32
BF16 = jnp.bfloat16

# record field indices -- must match fast2._RF
_RF = dict(
    bbx0=0, bby0=1, bbw=2, bbh=3, var=4, refl=5, alpha=6, ok=7,
    n_th=8, n_tv=9, z=10,
)


def _kernel(rec_ref, tex_ref, cv_ref, out_ref, *, cap: int, R: int):
    BN = cv_ref.shape[0]
    # Mosaic's tpu.iota is integer-only; build f32 pixel centers via a cast
    px = jax.lax.broadcasted_iota(I32, (BN, RES), 1).astype(F32) + 0.5  # (BN, 64)
    iota_y_R = jax.lax.broadcasted_iota(I32, (BN, RES, R), 2)
    iota_x_R = jax.lax.broadcasted_iota(I32, (BN, R, RES), 1)

    cv = [cv_ref[:, c] for c in range(3)]  # (BN, 64, 64) f32 each

    for k in range(cap):
        g = lambda f: rec_ref[:, k, _RF[f]]  # (BN,)
        ok = g("ok") > 0
        col = (px - g("bbx0")[:, None]) / g("bbw")[:, None]
        row = (px - g("bby0")[:, None]) / g("bbh")[:, None]
        in_x = (col >= 0) & (col < 1)
        in_y = (row >= 0) & (row < 1)
        n_th = g("n_th")[:, None]
        n_tv = g("n_tv")[:, None]
        uraw = col * n_th
        u = jnp.where(n_th > 1, uraw - jnp.floor(uraw), col)
        vraw = row * n_tv
        v = jnp.where(n_tv > 1, vraw - jnp.floor(vraw), row)
        su = jnp.clip((jnp.clip(u, 0.0, 0.9999) * R).astype(I32), 0, R - 1)
        sv = jnp.clip((jnp.clip(v, 0.0, 0.9999) * R).astype(I32), 0, R - 1)
        su = jnp.where((g("refl") > 0)[:, None], R - 1 - su, su)

        # Mosaic cannot reshape i1 vectors across the minor dim
        # ("tpu.reshape (BN,64)xi1 -> (BN,64,1)xi1" rejected on v5e), so the
        # bool masks are widened to f32 (32-bit broadcasts are supported)
        # and folded in by multiplication -- exact, 0/1 values only.
        m_y = jnp.where(in_y & (ok[:, None]), F32(1), F32(0))  # (BN, 64)
        m_x = jnp.where(in_x, F32(1), F32(0))  # (BN, 64)
        ohy = (
            (iota_y_R == sv[:, :, None]).astype(F32) * m_y[:, :, None]
        ).astype(BF16)  # (BN, 64, R)
        ohx = (
            (iota_x_R == su[:, None, :]).astype(F32) * m_x[:, None, :]
        ).astype(BF16)  # (BN, R, 64)

        # The texture block arrives premultiplied by BOTH atlas alpha and the
        # entity's own alpha (see _select_textures) -- exactly the einsum
        # path's tex_p -- so the blend is a pure fma with no per-entity
        # scalar broadcast (Mosaic rejects (BN,1,1)->(BN,64,64) broadcasts).
        sprs = []
        for c in range(4):
            tc = tex_ref[:, k, c]  # (BN, R, R) bf16
            tmp = jax.lax.dot_general(
                ohy, tc, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=F32,
            ).astype(BF16)  # (BN, 64, R)
            spr = jax.lax.dot_general(
                tmp, ohx, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=F32,
            )  # (BN, 64, 64)
            sprs.append(spr)
        a = sprs[3]
        for c in range(3):
            cv[c] = sprs[c] + cv[c] * (1 - a)

    for c in range(3):
        out_ref[:, c] = cv[c]


@functools.lru_cache(maxsize=None)
def _build_call(cap: int, R: int, BN: int, N: int):
    import os

    kern = functools.partial(_kernel, cap=cap, R=R)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, 3, RES, RES), jnp.float32),
        grid=(N // BN,),
        interpret=bool(os.environ.get("PROCGEN_TPU_PALLAS_INTERPRET")),
        in_specs=[
            pl.BlockSpec((BN, cap, len(_RF)), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, cap, 4, R, R), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 3, RES, RES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BN, 3, RES, RES), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )


def _select_textures(recs, atlas_flat, NV, R):
    """One-hot select + premultiply textures per (env, slot).

    recs: (N, CAP, F); atlas_flat: (NV, R*R*4) bf16 RAW texels (0..255,
    layout [sv, su, c] like fast2's var_flat -- bf16-exact).  Premultiplies
    atlas alpha AND the entity alpha in f32 then rounds to bf16, which is
    bit-for-bit the einsum path's ``tex_p`` (fast2.composite_entities).
    Returns planar (N, CAP, 4, R, R) bf16."""
    N, CAP, _ = recs.shape
    var = recs[:, :, _RF["var"]]
    ok = recs[:, :, _RF["ok"]] > 0
    alpha = recs[:, :, _RF["alpha"]]
    oh = (
        (var[..., None] == jnp.arange(NV, dtype=F32)[None, None, :]) & ok[..., None]
    ).astype(BF16)
    tex = jnp.einsum(
        "nkv,vf->nkf", oh, atlas_flat,
        preferred_element_type=jnp.float32,
    ).reshape(N, CAP, R, R, 4)
    a_tex = tex[..., 3:4] * (alpha / 255.0)[:, :, None, None, None]
    tex_p = jnp.concatenate([tex[..., :3] * a_tex, a_tex], axis=-1)
    return tex_p.transpose(0, 1, 4, 2, 3).astype(BF16)


def composite_entities_pallas(
    tables, records, kmax, canvas_planar, z_filter="all", cap=16, bn=None
):
    """Blend sorted entity records over a PLANAR canvas (N, 3, 64, 64) f32.

    Semantically identical to fast2.composite_entities (one nearest-sampled,
    tiled, reflected, alpha-blended draw per record in z order)."""
    N, E, F = records.shape
    R = tables.R

    # fold the z filter into ok before the kernel (the kernel has no z logic)
    if z_filter != "all":
        z = records[:, :, _RF["z"]]
        ok = records[:, :, _RF["ok"]]
        keep = (z < 0) if z_filter == "neg" else (z >= 0)
        records = records.at[:, :, _RF["ok"]].set(
            jnp.where(keep, ok, 0.0)
        )

    # raw texels (<= 255) are bf16-exact; premultiplication happens per
    # (env, slot) in _select_textures so entity alpha rounds identically
    # to the einsum path
    atlas_bf = jnp.asarray(tables.var_flat, jnp.bfloat16)

    if bn is None:
        bn = 32 if cap >= 16 else 64
    while N % bn != 0:
        bn //= 2
    call = _build_call(cap, R, bn, N)

    n_chunks = (E + cap - 1) // cap

    def run_chunk(recs_c, cv):
        tex = _select_textures(recs_c, atlas_bf, tables.NV, R)
        return call(recs_c, tex, cv)

    cv = canvas_planar
    for ci in range(n_chunks):
        g0 = ci * cap
        recs_c = records[:, g0 : g0 + cap]
        if recs_c.shape[1] < cap:
            pad = cap - recs_c.shape[1]
            recs_c = jnp.pad(recs_c, ((0, 0), (0, pad), (0, 0)))
        if n_chunks == 1:
            cv = run_chunk(recs_c, cv)
        else:
            cv = jax.lax.cond(
                g0 < kmax,
                lambda c, r=recs_c: run_chunk(r, c),
                lambda c: c,
                cv,
            )
    return cv
