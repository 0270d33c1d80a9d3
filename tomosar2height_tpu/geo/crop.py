"""2D / 3D bounding-box cropping of point arrays (host, numpy).

Parity with reference utils/crop_cloud.py:8-75 (strict inequalities so that
normalized points always land strictly inside the open unit square, keeping
``floor(x * reso)`` in range).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


_NATIVE_MIN_POINTS = 50_000  # below this numpy wins on call overhead


def crop_pc_2d_index(points: np.ndarray, p_min, p_max) -> np.ndarray:
    """Indices of points strictly inside the (x, y) bbox.

    Parity: reference utils/crop_cloud.py:8-29 (strict ``>`` / ``<``).
    Large float64 arrays route through the C++ runtime (native/tomosar_native.cpp
    ``ts_crop_pc_2d``); numpy otherwise.
    """
    p = np.asarray(points)
    if p.dtype == np.float64 and p.shape[0] >= _NATIVE_MIN_POINTS and p.flags.c_contiguous:
        from tomosar2height_tpu import native

        idx = native.crop_pc_2d_index(p, p_min, p_max)
        if idx is not None:
            return idx
    mask = (
        (p[:, 0] > p_min[0]) & (p[:, 0] < p_max[0])
        & (p[:, 1] > p_min[1]) & (p[:, 1] < p_max[1])
    )
    return np.nonzero(mask)[0]


def crop_pc_2d(points: np.ndarray, p_min, p_max) -> Tuple[np.ndarray, np.ndarray]:
    """Crop points to the open 2D bbox; returns (cropped_points, indices).

    Parity: reference utils/crop_cloud.py:32-50.
    """
    idx = crop_pc_2d_index(points, p_min, p_max)
    return np.asarray(points)[idx], idx


def crop_pc_3d(points: np.ndarray, p_min, p_max) -> Tuple[np.ndarray, np.ndarray]:
    """Crop points to a closed 3D axis-aligned bbox; returns (points, indices).

    Capability parity with reference utils/crop_cloud.py:53-75 (which delegates to
    open3d's AxisAlignedBoundingBox — inclusive bounds), without the open3d dependency.
    """
    p = np.asarray(points)
    mask = np.ones(p.shape[0], dtype=bool)
    for d in range(3):
        mask &= (p[:, d] >= p_min[d]) & (p[:, d] <= p_max[d])
    idx = np.nonzero(mask)[0]
    return p[idx], idx
