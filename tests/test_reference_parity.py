"""Whole-model numerical parity vs the torch reference (VERDICT r1 #2).

Ports Xavier-initialized weights from the reference's torch modules
(/root/reference/tomosar2height/model.py:54-67) into the flax tree, then
asserts forward parity on fixed patches for cloud-only, image-only and
cloud+image(+footprint) configs. torch_scatter and open3d are not installed;
they are shimmed with the same oracles golden-tested in tests/test_ops.py.

This is the insurance layer for BASELINE.md's "RMSE parity vs reference"
north star: any drift in grid_sample semantics, scatter empty-cell handling,
plane orientation, interpolation align_corners, or weight-layout conventions
fails here before real data ever runs.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tomosar2height_tpu.models import TomoSAR2Height  # noqa: E402

REFERENCE_ROOT = "/root/reference"


# --- shims for the reference's unavailable native deps ---------------------------


def _expand(index, src):
    return index.expand_as(src) if index.shape != src.shape else index


def _shim_torch_scatter():
    """Minimal torch_scatter covering the reference's three call patterns
    (pointnet.py:95,109; alto.py:85): scatter along the last dim, index
    broadcast over channels, optional zero-filled ``out``."""
    mod = types.ModuleType("torch_scatter")

    def scatter_mean(src, index, dim=-1, out=None, dim_size=None):
        index = _expand(index, src)
        dim = dim % src.dim()
        if out is not None:
            size = out.shape[dim]
        elif dim_size is not None:
            size = dim_size
        else:
            size = int(index.max()) + 1
        shape = list(src.shape)
        shape[dim] = size
        sums = torch.zeros(shape, dtype=src.dtype).scatter_add_(dim, index, src)
        cnt = torch.zeros(shape, dtype=src.dtype).scatter_add_(
            dim, index, torch.ones_like(src))
        res = sums / cnt.clamp(min=1.0)
        if out is not None:  # reference always passes zeros
            out.add_(res)
            return out
        return res

    def scatter_max(src, index, dim=-1, dim_size=None):
        index = _expand(index, src)
        dim = dim % src.dim()
        size = dim_size if dim_size is not None else int(index.max()) + 1
        shape = list(src.shape)
        shape[dim] = size
        out = torch.full(shape, -float("inf"), dtype=src.dtype)
        out = out.scatter_reduce(dim, index, src, reduce="amax", include_self=True)
        out = torch.where(torch.isfinite(out), out,
                          torch.zeros((), dtype=src.dtype))
        return out, None  # argmax unused by the reference (takes fea[0])

    mod.scatter_mean = scatter_mean
    mod.scatter_max = scatter_max
    return mod


@pytest.fixture(scope="module")
def reference():
    """Import the reference model package with shimmed deps."""
    sys.modules.setdefault("torch_scatter", _shim_torch_scatter())
    # reference utils/__init__.py pulls io_cloud/io_raster, whose deps are
    # absent here; only utils.coordinate.coordinate2index is on the model path
    for name in ("open3d", "laspy", "rasterio"):
        sys.modules.setdefault(name, types.ModuleType(name))
    o3d = sys.modules["open3d"]
    if not hasattr(o3d, "geometry"):  # annotation in io_cloud.py:53
        o3d.geometry = types.SimpleNamespace(PointCloud=object)
        o3d.utility = types.SimpleNamespace(Vector3dVector=object)
    rio = sys.modules["rasterio"]
    rt = types.ModuleType("rasterio.transform")  # io_raster.py:9
    rt.Affine = object
    rio.transform = rt
    rio.DatasetReader = object  # annotations in io_raster.py:156,160
    rio.io = types.SimpleNamespace(DatasetWriter=object)  # io_raster.py:174
    sys.modules.setdefault("rasterio.transform", rt)
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    ref_model = pytest.importorskip("tomosar2height.model")
    return ref_model


class _Cfg(dict):
    """dict with attribute access (the reference reads cfg.use_cloud AND
    cfg['model'], model.py:17-41)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _ref_cfg(use_cloud, use_image, use_footprint):
    return _Cfg(
        use_cloud=use_cloud,
        use_image=use_image,
        model=dict(
            data_dim=3,
            encoder="pointnet_local_pool",
            encoder_kwargs=dict(
                feature_dim=32, hidden_dim=32, scatter_type="max",
                unet_type="alto", plane_resolution=32,
                unet_kwargs=dict(depth=4, start_filts=32, merge_mode="concat"),
            ),
            encoder2="unet",
            encoder2_kwargs=dict(num_classes=32, in_channels=3, depth=3,
                                 start_filts=16),
            decoder_pixel_kwargs=dict(hidden_dim=32, out_dim=1, output_size=64,
                                      mode="conv", use_footprint=use_footprint),
        ),
        test=dict(threshold=0.5),
        dataset=dict(normalize=dict(z_bound=[0.0, 60.0])),
    )


def _flax_model(use_cloud, use_image, use_footprint):
    return TomoSAR2Height(
        use_cloud=use_cloud,
        use_image=use_image,
        encoder_kwargs=dict(
            feature_dim=32, hidden_dim=32, scatter_type="max",
            unet_type="alto", plane_resolution=32,
            unet_kwargs=dict(depth=4, start_filts=32, merge_mode="concat"),
        ),
        encoder2_kwargs=dict(num_classes=32, depth=3, start_filts=16),
        decoder_kwargs=dict(hidden_dim=32, out_dim=1, output_size=64,
                            mode="conv", use_footprint=use_footprint),
        z_scale=60.0,
    )


# --- torch state_dict -> flax param tree ------------------------------------------


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _torch_module_key(path):
    """flax param path (without trailing kernel/bias) -> torch module name."""
    parts = []
    for p in path:
        if p.startswith("block") and p[5:].isdigit():
            parts.append(f"blocks.{p[5:]}")  # pointnet ResnetBlockFC list
        elif p.startswith("down") and p[4:].isdigit():
            parts.append(f"down_convs.{p[4:]}")
        elif p.startswith("up") and p[2:].isdigit():
            parts.append(f"up_convs.{p[2:]}")
        elif p == "res1x1" or p == "res_up":
            parts.append("conv1x1")  # the residual 1x1/up path in ALTO blocks
        elif p == "fc_comm":
            parts.append("fc_comm")
        elif p == "fc_in":
            parts[-1] += ".0"  # nn.Sequential(Linear, ReLU, Linear)
            continue
        elif p == "fc_out" and parts and parts[-1].endswith("fc_comm"):
            parts[-1] += ".2"
            continue
        elif p == "upconv_1x1":
            parts.append("upconv.1")  # Sequential(Upsample, conv1x1), unet.py:31-34
        elif p == "down1x1":
            parts.append("downsample.2")  # Sequential(bn4, ReLU, conv1x1)
        else:
            parts.append(p)
    return ".".join(parts)


def _port_arrays(sd, flax_params):
    """Map a torch-keyed dict of arrays (weights OR grads) onto the flax tree.

    Layout conversions: Linear (out,in)->(in,out); Conv2d (O,I,kh,kw)->
    (kh,kw,I,O); ConvTranspose2d (I,O,kh,kw)->(kh,kw,I,O) with a spatial flip
    (flax ConvTranspose applies the kernel mirrored vs torch's transposed-conv
    definition — verified numerically). The conversions are pure layout
    permutations, so they apply identically to gradients.
    """
    flat = _flatten(flax_params["params"])
    ported = {}
    for path, leaf in flat.items():
        mod_path, leaf_name = path[:-1], path[-1]
        tkey = _torch_module_key(mod_path)
        # upconv_1x1 (upsample mode) is a plain 1x1 Conv2d, not a transpose
        is_transpose = mod_path[-1] in ("upconv", "res_up")
        if leaf_name == "bias":
            w = sd.pop(tkey + ".bias")
        elif leaf_name == "scale":  # GroupNorm affine: flax 'scale' = torch 'weight'
            w = sd.pop(tkey + ".weight")
        else:
            w = sd.pop(tkey + ".weight")
            if w.ndim == 2:  # Linear
                w = w.T
            elif is_transpose:  # ConvTranspose2d
                w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            else:  # Conv2d
                w = w.transpose(2, 3, 1, 0)
        assert w.shape == leaf.shape, (
            f"{path} <- {tkey}: {w.shape} vs {leaf.shape}")
        ported[path] = jnp.asarray(w.copy())
    # anything left over must be parameters the reference creates but never
    # uses on this path (e.g. the last UpConv's upconv/fc_comm/fc_c)
    return {"params": _unflatten(ported)}, sorted(sd)


def port_torch_to_flax(torch_model, flax_params):
    """Overwrite every flax leaf with its reference counterpart."""
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    return _port_arrays(sd, flax_params)


def port_torch_grads(torch_model, flax_params):
    """Map the reference's ``.grad`` tensors onto the flax tree layout
    (dead-head params with grad None are zero-filled — they receive no
    gradient on either side)."""
    sd = {}
    for k, p in torch_model.named_parameters():
        sd[k] = (np.zeros(p.shape, np.float32) if p.grad is None
                 else p.grad.detach().numpy())
    return _port_arrays(sd, flax_params)


# --- the parity checks -------------------------------------------------------------


def _fixed_inputs(rng, n=512, img_size=64):
    pts = rng.uniform(0.01, 0.99, (1, n, 3)).astype(np.float32)
    img = rng.normal(size=(1, img_size, img_size, 3)).astype(np.float32)
    return pts, img


def _run_pair(reference, use_cloud, use_image, use_footprint, rng):
    torch.manual_seed(0)
    ref = reference.TomoSAR2Height(_ref_cfg(use_cloud, use_image, use_footprint))
    ref.eval()

    model = _flax_model(use_cloud, use_image, use_footprint)
    pts, img = _fixed_inputs(rng)
    points = jnp.asarray(pts) if use_cloud else None
    mask = jnp.ones(pts.shape[:2], bool) if use_cloud else None
    image = jnp.asarray(img) if use_image else None
    params = model.init(jax.random.PRNGKey(0), points, mask, image)
    params, unused = port_torch_to_flax(ref, params)
    # every unused torch param must be a known dead head of the reference
    for k in unused:
        assert any(s in k for s in ("upconv.", "fc_comm", "fc_c")), \
            f"unexpected unported torch param: {k}"

    with torch.no_grad():
        pa_t, pb_t = ref(
            torch.from_numpy(pts) if use_cloud else None,
            torch.from_numpy(img.transpose(0, 3, 1, 2)) if use_image else None,
        )
    pa_j, pb_j = model.apply(params, points, mask, image)
    return (np.asarray(pa_j), pa_t.numpy(),
            None if pb_j is None else np.asarray(pb_j),
            None if pb_t is None else pb_t.numpy())


class TestReferenceParity:
    def test_cloud_only(self, reference, rng):
        pa_j, pa_t, _, _ = _run_pair(reference, True, False, False, rng)
        assert pa_t.shape == pa_j.shape
        np.testing.assert_allclose(pa_j, pa_t, atol=1e-4, rtol=0)

    def test_image_only(self, reference, rng):
        pa_j, pa_t, _, _ = _run_pair(reference, False, True, False, rng)
        np.testing.assert_allclose(pa_j, pa_t, atol=1e-4, rtol=0)

    def test_cloud_image_footprint(self, reference, rng):
        pa_j, pa_t, pb_j, pb_t = _run_pair(reference, True, True, True, rng)
        np.testing.assert_allclose(pa_j, pa_t, atol=1e-4, rtol=0)
        assert pb_j is not None and pb_t is not None
        np.testing.assert_allclose(pb_j, pb_t, atol=1e-4, rtol=0)

    def test_outputs_not_trivial(self, reference, rng):
        """Guard against vacuous parity (all-zero outputs)."""
        pa_j, pa_t, _, _ = _run_pair(reference, True, False, False, rng)
        assert float(np.abs(pa_t).max()) > 1e-3

    def test_grad_parity_default_path(self, reference, rng):
        """d(loss)/d(params) matches torch autograd on the default path
        (VERDICT r02 item 4: training-equivalence previously rested on
        XLA-vs-XLA checks only). Loss = L1 to a fixed target, the reference
        training loss (trainer.py:61-70, footprint off)."""
        torch.manual_seed(0)
        ref = reference.TomoSAR2Height(_ref_cfg(True, False, False))
        ref.eval()
        model = _flax_model(True, False, False)
        pts, _ = _fixed_inputs(rng)
        target = rng.uniform(0, 50, (1, 64, 64)).astype(np.float32)
        points = jnp.asarray(pts)
        mask = jnp.ones(pts.shape[:2], bool)
        params = model.init(jax.random.PRNGKey(0), points, mask, None)
        params, _ = port_torch_to_flax(ref, params)

        pa_t, _ = ref(torch.from_numpy(pts), None)
        loss_t = torch.nn.functional.l1_loss(pa_t, torch.from_numpy(target))
        loss_t.backward()
        g_ref, _ = port_torch_grads(ref, params)

        def loss_fn(p):
            pa, _ = model.apply(p, points, mask, None)
            return jnp.abs(pa - jnp.asarray(target)).mean()

        loss_j, g_j = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)

        flat_r = _flatten(g_ref["params"])
        flat_j = _flatten(g_j["params"])
        assert set(flat_r) == set(flat_j)
        gmax = max(float(np.abs(np.asarray(v)).max()) for v in flat_r.values())
        assert gmax > 0
        worst = 0.0
        for path in flat_r:
            a = np.asarray(flat_j[path])
            b = np.asarray(flat_r[path])
            err = float(np.abs(a - b).max())
            worst = max(worst, err / gmax)
            assert err <= 1e-4 + 1e-3 * gmax, (path, err, gmax)
        assert worst < 1e-3
