"""wire_cells='device': the model recomputes Morton cell ids on device
bit-exactly, so the trainer can drop the (B, Npad) int32 upload."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tomosar2height_tpu.ops.pallas.gather_kernel import CHUNK
from tomosar2height_tpu.ops.sorted_scatter import (
    PAD_CELL_SENTINEL,
    host_morton_bucket,
    host_morton_bucket_aligned,
    morton_cells_device,
)


def _rand_points(n, seed, frac_pad=0.2):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(1e-6, 1.0 - 1e-6, (n, 3)).astype(np.float32)
    mask = rng.random(n) > frac_pad
    pts[~mask] = 0.5
    return pts, mask


@pytest.mark.parametrize("reso", [32, 256])
def test_matches_aligned_layout(reso):
    pts, mask = _rand_points(3000, seed=0)
    a = host_morton_bucket_aligned(pts, mask, reso, CHUNK)
    dev = morton_cells_device(jnp.asarray(a["points"]),
                              jnp.asarray(a["mask"]), reso,
                              int(PAD_CELL_SENTINEL))
    np.testing.assert_array_equal(np.asarray(dev), a["cells"])


def test_matches_plain_sorted_layout():
    reso = 64
    pts, mask = _rand_points(2000, seed=1)
    order, cells_sorted, _ = host_morton_bucket(pts, mask, reso)
    dev = morton_cells_device(jnp.asarray(pts[order]),
                              jnp.asarray(mask[order]), reso, reso * reso)
    np.testing.assert_array_equal(np.asarray(dev), cells_sorted)


def test_boundary_quantization_exact():
    # coordinates straddling cell boundaries: x*reso landing exactly on an
    # integer must truncate identically to the host layout
    reso = 128
    xs = np.array([1.0 / reso, 2.0 / reso, 0.9999999, 1e-7,
                   63.5 / reso, 63.49999 / reso], dtype=np.float32)
    pts = np.stack([xs, xs, xs], axis=1)
    mask = np.ones(len(xs), bool)
    order, cells_sorted, _ = host_morton_bucket(pts, mask, reso)
    dev = morton_cells_device(jnp.asarray(pts[order]),
                              jnp.asarray(mask[order]), reso, reso * reso)
    np.testing.assert_array_equal(np.asarray(dev), cells_sorted)


def test_trainer_drops_cell_upload_same_loss():
    from tomosar2height_tpu.models.pointnet import LocalPoolPointnet

    reso, n, b = 32, 600, 2
    rngs = np.random.default_rng(3)
    apts = np.zeros((b, 0), np.float32)
    rows = []
    for i in range(b):
        pts, mask = _rand_points(n, seed=10 + i)
        rows.append(host_morton_bucket_aligned(pts, mask, reso, CHUNK))
    npad = rows[0]["points"].shape[0]
    apts = np.stack([r["points"] for r in rows])
    amask = np.stack([r["mask"] for r in rows])
    acell = np.stack([r["cells"] for r in rows])
    atoff = np.stack([r["tile_offsets"] for r in rows])
    del rngs, npad
    model = LocalPoolPointnet(
        feature_dim=8, hidden_dim=8, plane_resolution=reso,
        scatter_type="max", unet_type="alto",
        unet_kwargs={"depth": 2, "start_filts": 8, "merge_mode": "concat"},
        sorted_impl="fused2", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(apts[:1]),
                        jnp.asarray(amask[:1]), jnp.asarray(acell[:1]),
                        jnp.asarray(atoff[:1]))
    with_cells = model.apply(params, jnp.asarray(apts), jnp.asarray(amask),
                             jnp.asarray(acell), jnp.asarray(atoff))["xy"]
    without = model.apply(params, jnp.asarray(apts), jnp.asarray(amask),
                          None, jnp.asarray(atoff))["xy"]
    np.testing.assert_array_equal(np.asarray(with_cells), np.asarray(without))
