from tomosar2height_tpu.data.dataset import TomoSARDataset  # noqa: F401
from tomosar2height_tpu.data.pipeline import (  # noqa: F401
    PatchLoader,
    pick_bucket,
    tile_cells_for_impl,
)
from tomosar2height_tpu.data.builder import build_dataset  # noqa: F401
