from tomosar2height_tpu.ops.pallas.scatter_kernel import pallas_scatter_mean  # noqa: F401
