"""Port reference (PyTorch) weights and checkpoints onto the flax param tree.

The reference trains `TomoSAR2Height` in torch and checkpoints a dict of
module ``state_dict``s plus scalar metadata (reference utils/io_checkpoint.py:
38-48). This module maps those tensors — key by key, with the layout
permutations torch↔flax require — onto this framework's parameter pytree, so
a user of the reference can bring a trained ``model_best.pt`` across without
retraining (CLI: ``scripts/port_torch_checkpoint.py``).

The mapping is pinned numerically by ``tests/test_reference_parity.py``:
whole-model forward ≤1e-4 and gradient parity vs torch autograd through
ported weights, at harness shapes and at the full flagship shape
(``scripts/parity_flagship.py``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def flatten_tree(tree, prefix=()) -> Dict[tuple, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten_tree(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def unflatten_tree(flat: Dict[tuple, np.ndarray]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def torch_module_key(path) -> str:
    """flax param path (without trailing kernel/bias) -> torch module name.

    Encodes the structural differences between the two implementations:
    flax list-modules are flattened (``down3`` -> ``down_convs.3``), the
    reference's ``nn.Sequential`` members are positional indices, and ALTO's
    residual 1x1 paths carry different names (reference encoder/alto.py,
    encoder/unet.py:31-34).
    """
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


def port_arrays(sd: Dict[str, np.ndarray], flax_params) -> Tuple[dict, list]:
    """Map a torch-keyed dict of arrays (weights OR grads) onto the flax tree.

    Layout conversions: Linear (out,in)->(in,out); Conv2d (O,I,kh,kw)->
    (kh,kw,I,O); ConvTranspose2d (I,O,kh,kw)->(kh,kw,I,O) with a spatial flip
    (flax ConvTranspose applies the kernel mirrored vs torch's transposed-conv
    definition — verified numerically). The conversions are pure layout
    permutations, so they apply identically to gradients.

    Consumes ``sd`` destructively; returns ``(ported_params, leftover_keys)``
    where leftovers are reference parameters unused on this config's path
    (e.g. the last UpConv's dead point-branch heads).
    """
    flat = flatten_tree(flax_params["params"])
    ported = {}
    for path, leaf in flat.items():
        mod_path, leaf_name = path[:-1], path[-1]
        tkey = torch_module_key(mod_path)
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
    return {"params": unflatten_tree(ported)}, sorted(sd)


def port_torch_to_flax(torch_model, flax_params) -> Tuple[dict, list]:
    """Overwrite every flax leaf with its reference counterpart (live module)."""
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    return port_arrays(sd, flax_params)


def port_torch_grads(torch_model, flax_params) -> Tuple[dict, list]:
    """Map the reference's ``.grad`` tensors onto the flax tree layout
    (dead-head params with grad None are zero-filled — they receive no
    gradient on either side)."""
    sd = {}
    for k, p in torch_model.named_parameters():
        sd[k] = (np.zeros(tuple(p.shape), np.float32) if p.grad is None
                 else p.grad.detach().numpy())
    return port_arrays(sd, flax_params)


def export_arrays(flax_params) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_arrays`: flax param tree -> torch-keyed arrays.

    Applies the inverse layout permutations (Linear (in,out)->(out,in);
    Conv2d (kh,kw,I,O)->(O,I,kh,kw); ConvTranspose2d spatial un-flip +
    (I,O,kh,kw)), producing a state_dict the reference's torch model loads
    with ``strict=False`` (parameters of dead heads the reference allocates
    but never uses on a config's path are absent — they receive no gradient
    on either side, so their init values are irrelevant).
    """
    flat = flatten_tree(flax_params["params"])
    sd: Dict[str, np.ndarray] = {}
    for path, leaf in flat.items():
        mod_path, leaf_name = path[:-1], path[-1]
        tkey = torch_module_key(mod_path)
        w = np.asarray(leaf)
        if leaf_name in ("bias", "scale"):
            sd[tkey + (".bias" if leaf_name == "bias" else ".weight")] = w.copy()
            continue
        if w.ndim == 2:  # Linear (in,out) -> (out,in)
            w = w.T
        elif mod_path[-1] in ("upconv", "res_up"):  # ConvTranspose2d
            w = w.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
        elif w.ndim == 4:  # Conv2d (kh,kw,I,O) -> (O,I,kh,kw)
            w = w.transpose(3, 2, 0, 1)
        sd[tkey + ".weight"] = w.copy()
    return sd


# scalar metadata keys the reference checkpoints alongside the state dicts
# (reference utils/io_checkpoint.py:38-48, train.py:170-183)
REFERENCE_SCALARS = ("n_iter", "loss_val_best", "training_time")


def load_reference_checkpoint(path: str):
    """Read a reference ``.pt`` checkpoint file -> (model_state_dict, scalars).

    The file is a torch pickle of {'model': state_dict, 'optimizer': ...,
    'scheduler': ..., n_iter, loss_val_best, training_time}; only the model
    tensors and the scalars cross (torch optimizer/scheduler state has no
    optax equivalent — resume momentum from a fresh state instead).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    sd = blob.get("model")
    assert sd is not None, f"{path}: no 'model' state_dict in checkpoint"
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    scalars = {k: blob[k] for k in REFERENCE_SCALARS if k in blob}
    return sd, scalars
