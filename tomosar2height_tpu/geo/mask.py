"""Binary mask morphology (host). Parity: reference utils/dilate_mask.py:4-15."""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def dilate_mask(mask_in: np.ndarray, iterations: int = 1) -> np.ndarray:
    """Binary dilation with the default 4-connected structuring element.

    Matches scipy's ``binary_dilation`` defaults used by the reference
    (utils/dilate_mask.py:15).
    """
    return ndimage.binary_dilation(np.asarray(mask_in).astype(bool), iterations=iterations)
