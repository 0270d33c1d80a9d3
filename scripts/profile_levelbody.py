"""A/B the level kernel's bilinear-weight construction on the real chip.

The fused level kernel builds a (WIN_FLAT=576, PCHUNK=128) bilinear weight
matrix per chunk with FOUR full-width iota-compare one-hots (~74k lanes x 11
VPU ops ~ 0.85 us/step — the largest single term in the level kernels'
~2.7 us/step body). The separable construction builds an 18-wide row one-hot
and a 32-wide col one-hot (~6k lanes) and outer-products them.

Variants:
  bil4   — current 4x full-width construction + gather matmul
  bilsep — separable wy (18,P) * wx (32,P) -> (18,32,P) mul -> reshape (576,P)
  bilrep — separable via jnp.repeat/jnp.tile on 2-D values (no 3-D reshape)
  nobil  — gather matmul with a PRECOMPUTED constant weight (floor: matmul only)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_Y, WIN_X = 18, 32
WIN_FLAT = WIN_Y * WIN_X
PCHUNK = 128


def _mk_wt_bil4(xs, ys, reso, wx0, wy0, dt):
    xs = jnp.clip(xs * (reso - 1), 0.0, reso - 1)
    ys = jnp.clip(ys * (reso - 1), 0.0, reso - 1)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    lx = x0.astype(jnp.int32) - wx0
    ly = y0.astype(jnp.int32) - wy0
    c00 = ly * WIN_X + lx
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_FLAT, PCHUNK), 0)
    return (
        (row_iota == c00).astype(jnp.float32) * ((1 - fy) * (1 - fx))
        + (row_iota == c00 + 1).astype(jnp.float32) * ((1 - fy) * fx)
        + (row_iota == c00 + WIN_X).astype(jnp.float32) * (fy * (1 - fx))
        + (row_iota == c00 + WIN_X + 1).astype(jnp.float32) * (fy * fx)
    ).astype(dt)


def _mk_wt_sep(xs, ys, reso, wx0, wy0, dt, mode):
    xs = jnp.clip(xs * (reso - 1), 0.0, reso - 1)
    ys = jnp.clip(ys * (reso - 1), 0.0, reso - 1)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    lx = x0.astype(jnp.int32) - wx0
    ly = y0.astype(jnp.int32) - wy0
    yi = jax.lax.broadcasted_iota(jnp.int32, (WIN_Y, PCHUNK), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (WIN_X, PCHUNK), 0)
    wy = ((yi == ly).astype(jnp.float32) * (1 - fy)
          + (yi == ly + 1).astype(jnp.float32) * fy)        # (18, P)
    wxm = ((xi == lx).astype(jnp.float32) * (1 - fx)
           + (xi == lx + 1).astype(jnp.float32) * fx)       # (32, P)
    if mode == "reshape":
        w3 = wy[:, None, :] * wxm[None, :, :]               # (18, 32, P)
        return w3.reshape(WIN_FLAT, PCHUNK).astype(dt)
    # 2-D only: repeat rows of wy 32x, tile wxm 18x
    wy_e = jnp.repeat(wy, WIN_X, axis=0)                    # (576, P)
    wx_e = jnp.tile(wxm, (WIN_Y, 1))                        # (576, P)
    return (wy_e * wx_e).astype(dt)


def _kernel(aux_ref, win_ref, wconst_ref, out_ref, *, variant, reso):
    dt = out_ref.dtype
    aux = aux_ref[0, 0]
    xs = jax.lax.slice(aux, (0, 0), (1, PCHUNK))
    ys = jax.lax.slice(aux, (0, PCHUNK), (1, 2 * PCHUNK))
    wy0, wx0 = 0, 0
    if variant == "bil4":
        w_t = _mk_wt_bil4(xs, ys, reso, wx0, wy0, dt)
    elif variant == "bilsep":
        w_t = _mk_wt_sep(xs, ys, reso, wx0, wy0, dt, "reshape")
    elif variant == "bilrep":
        w_t = _mk_wt_sep(xs, ys, reso, wx0, wy0, dt, "repeat")
    else:
        w_t = wconst_ref[:]
    win = win_ref[0]
    out_ref[0] = jax.lax.dot_general(
        w_t, win, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)


def bench(variant, b, nc, fp, reps, reso=18):
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    aux = jnp.asarray(rng.uniform(0.05, 0.95, (b, nc, 1, 2 * PCHUNK))
                      .astype(np.float32))
    win = jnp.asarray(rng.standard_normal((1, WIN_FLAT, fp)).astype(dt))
    wconst = jnp.asarray(rng.standard_normal((WIN_FLAT, PCHUNK)).astype(dt))
    spec = pl.GridSpec(
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 2 * PCHUNK),
                         lambda b_, k_: (b_, k_, 0, 0)),
            pl.BlockSpec((1, WIN_FLAT, fp), lambda b_, k_: (0, 0, 0)),
            pl.BlockSpec((WIN_FLAT, PCHUNK), lambda b_, k_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, PCHUNK, fp), lambda b_, k_: (b_, k_, 0)),
    )
    fn = pl.pallas_call(
        functools.partial(_kernel, variant=variant, reso=reso),
        out_shape=jax.ShapeDtypeStruct((b, nc * PCHUNK, fp), dt),
        grid_spec=spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    jfn = jax.jit(lambda *a: fn(*a))
    out = jfn(aux, win, wconst)
    out.block_until_ready()
    _ = float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(aux, win, wconst)
    _ = float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    dtm = (time.perf_counter() - t0) / reps
    steps = b * nc
    print(f"{variant:7s}: {dtm * 1e3:7.3f} ms/call  {dtm / steps * 1e6:6.3f} us/step")


def check_equal():
    """Separable construction must equal the 4-compare construction."""
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.uniform(0.05, 0.95, (1, PCHUNK)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(0.05, 0.95, (1, PCHUNK)).astype(np.float32))
    a = _mk_wt_bil4(xs, ys, 18, 0, 0, jnp.float32)
    c = _mk_wt_sep(xs, ys, 18, 0, 0, jnp.float32, "reshape")
    d = _mk_wt_sep(xs, ys, 18, 0, 0, jnp.float32, "repeat")
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(d), atol=1e-6)
    print("constructions agree (host check)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--nc", type=int, default=160)
    ap.add_argument("--fp", type=int, default=128)
    ap.add_argument("--reps", type=int, default=30)
    a = ap.parse_args()
    from tomosar2height_tpu.utils import enable_compile_cache

    enable_compile_cache()
    check_equal()
    for v in ("nobil", "bil4", "bilsep", "bilrep"):
        try:
            bench(v, a.b, a.nc, a.fp, a.reps)
        except Exception as e:  # noqa: BLE001 — report which variant fails to lower
            print(f"{v:7s}: FAILED {type(e).__name__}: {str(e)[:200]}")
