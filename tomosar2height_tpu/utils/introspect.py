"""Feature-map introspection (tracing aid).

The reference keeps commented-out debug ``forward``s that collect per-layer
activations into a pickle for PCA visualization (alto.py:384-412,
unet.py:189-213 + scripts/visualize_featuremap.py). The flax-native equivalent
is ``capture_intermediates`` — no model-code changes needed.
"""

from __future__ import annotations

import pickle
from typing import List, Tuple

import numpy as np


def capture_feature_maps(model, params, *args, **kwargs):
    """Run a forward pass collecting every submodule's outputs.

    Returns (outputs, list of (dotted_name, np.ndarray)); only 4D NHWC feature
    planes are kept (what the visualizer consumes).
    """
    out, state = model.apply(
        params, *args, capture_intermediates=True, mutable=["intermediates"], **kwargs
    )
    fmaps: List[Tuple[str, np.ndarray]] = []

    def walk(node, prefix=""):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(node, (tuple, list)):
            for v in node:
                walk(v, prefix)
        else:
            arr = np.asarray(node)
            if arr.ndim == 4:  # NHWC plane
                fmaps.append((prefix.replace(".__call__", ""), arr))

    walk(state["intermediates"])
    return out, fmaps


def save_feature_maps(path: str, fmaps) -> None:
    """Persist name->array pairs (pickle; consumed by scripts/visualize_featuremap.py)."""
    with open(path, "wb") as f:
        pickle.dump([(n, np.asarray(a)) for n, a in fmaps], f)


def load_feature_maps(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
