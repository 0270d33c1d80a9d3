"""Building-instance metrics: per-building median height errors.

Parity: reference scripts/evaluator_instance.py:35-57,139-166 — connected-
component labeling of the footprint mask (8-connectivity, matching skimage
``label(connectivity=2)``), per-building median of predicted and GT heights,
then RMSE-B / MAE-B / MedAE-B over buildings. Also the raw-point median
baseline (:169-291): per-building median of point z (minus DTM) without any
network.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from scipy import ndimage

EIGHT_CONN = np.ones((3, 3), dtype=int)


def label_buildings(building_mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """8-connected component labels (0 = background)."""
    labels, n = ndimage.label(np.asarray(building_mask) > 0, structure=EIGHT_CONN)
    return labels, n


def median_height_per_building(height_map: np.ndarray, labels: np.ndarray, n: int) -> np.ndarray:
    """Median height of each labeled building (vectorized via labeled_comprehension)."""
    if n == 0:
        return np.empty(0)
    return ndimage.labeled_comprehension(
        height_map, labels, np.arange(1, n + 1), np.median, np.float64, np.nan
    )


def buildingwise_errors(
    pred_height_map: np.ndarray,
    gt_height_map: np.ndarray,
    building_mask: np.ndarray,
) -> Dict[str, float]:
    """RMSE-B / MAE-B / MedAE-B over per-building medians
    (reference evaluator_instance.py:35-57)."""
    labels, n = label_buildings(building_mask)
    pred = median_height_per_building(pred_height_map, labels, n)
    gt = median_height_per_building(gt_height_map, labels, n)
    ok = np.isfinite(pred) & np.isfinite(gt)
    pred, gt = pred[ok], gt[ok]
    d = pred - gt
    return {
        "RMSE_B": float(np.sqrt(np.mean(d ** 2))) if d.size else float("nan"),
        "MAE_B": float(np.mean(np.abs(d))) if d.size else float("nan"),
        "MedAE_B": float(np.median(np.abs(d))) if d.size else float("nan"),
        "n_buildings": int(d.size),
    }


def buildingwise_errors_georef(pred_raster, gt_raster, mask_raster) -> Dict[str, float]:
    """Georeferenced variant: clips GT and mask to the predicted raster's extent
    using the affine transforms before scoring (the reference CLI assumes
    pre-clipped same-extent chunk tiles, evaluator_instance.py:60-66)."""
    import numpy as np

    pred = pred_raster.get_data()
    tl = pred_raster.T * (0, 0)
    cr = np.floor((~gt_raster.T).apply(np.array([tl]))).astype(int)
    c0, r0 = int(cr[0, 0]), int(cr[0, 1])
    h, w = pred.shape
    gt = gt_raster.get_data()[r0:r0 + h, c0:c0 + w]
    cr = np.floor((~mask_raster.T).apply(np.array([tl]))).astype(int)
    mc0, mr0 = int(cr[0, 0]), int(cr[0, 1])
    mask = mask_raster.get_data()[mr0:mr0 + h, mc0:mc0 + w]
    return buildingwise_errors(pred, gt, mask)


def pointcloud_median_baseline(
    points: np.ndarray,
    gt_ndsm,
    building_mask,
    dtm: Optional[object] = None,
    include_empty: bool = True,
) -> Dict[str, float]:
    """Network-free baseline: per-building median of raw point heights
    (optionally minus a DTM) vs the GT nDSM per-building median
    (reference evaluator_instance.py:169-291).

    Args:
        points: (N, 3) world coordinates.
        gt_ndsm: RasterData with the GT nDSM.
        building_mask: RasterData with the footprint mask (same grid as GT).
        dtm: optional RasterData terrain model; point height = z - dtm(x, y).
        include_empty: score buildings without points as height 0
            (reference's "all buildings" variant :289-291) or skip them
            (the "valid buildings" variant :227-229).
    """
    mask_arr = building_mask.get_data() > 0
    labels, n = label_buildings(mask_arr)
    gt_medians = median_height_per_building(gt_ndsm.get_data(), labels, n)

    cols, rows = building_mask.query_col_rows(points[:, :2])
    inside = building_mask.is_in(cols, rows)
    pts_in = points[inside]
    lab_per_pt = labels[rows[inside], cols[inside]]

    z = pts_in[:, 2].astype(np.float64)
    if dtm is not None:
        z = z - dtm.query_values(pts_in[:, :2]).astype(np.float64)

    pred = np.full(n, np.nan)
    order = np.argsort(lab_per_pt)
    lab_sorted = lab_per_pt[order]
    z_sorted = z[order]
    starts = np.searchsorted(lab_sorted, np.arange(1, n + 2))
    for b in range(n):
        seg = z_sorted[starts[b]:starts[b + 1]]
        if seg.size:
            pred[b] = np.median(seg)

    if include_empty:
        pred = np.where(np.isfinite(pred), pred, 0.0)
    ok = np.isfinite(pred) & np.isfinite(gt_medians)
    d = pred[ok] - gt_medians[ok]
    return {
        "RMSE_B": float(np.sqrt(np.mean(d ** 2))) if d.size else float("nan"),
        "MAE_B": float(np.mean(np.abs(d))) if d.size else float("nan"),
        "MedAE_B": float(np.median(np.abs(d))) if d.size else float("nan"),
        "n_buildings": int(d.size),
    }
