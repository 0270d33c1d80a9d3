from tomosar2height_tpu.ops.pallas.scatter_kernel import (  # noqa: F401
    pallas_scatter_mean,
    pallas_scatter_mean_plane,
)
