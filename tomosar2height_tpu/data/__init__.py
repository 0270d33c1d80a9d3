from tomosar2height_tpu.data.dataset import TomoSARDataset  # noqa: F401
from tomosar2height_tpu.data.pipeline import PatchLoader, pick_bucket  # noqa: F401
from tomosar2height_tpu.data.builder import build_dataset  # noqa: F401
