"""TomoSAR2Height-TPU: a TPU-native (JAX/XLA/Pallas) framework for building-height
raster (nDSM) reconstruction from spaceborne TomoSAR point clouds, optionally fused
with optical satellite imagery.

Capability-equivalent rebuild of the reference PyTorch/CUDA implementation
(zhu-xlab/tomosar2height), re-designed TPU-first:

- functional, jit-able model core (flax.linen, NHWC layout for TPU convs)
- ragged point clouds handled via bucketed padding + masking (static shapes for XLA)
- point<->grid transfers via masked segment reductions (XLA scatter / Pallas kernel)
- data parallelism over patches with ``jax.sharding.Mesh`` + ``shard_map`` (psum grads)
- host-side geo I/O in float64 numpy (GeoTIFF codec, LAS parser — no GDAL dependency)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: importing the package must not pull in jax/flax (host-only tools use geo/)
    if name == "TomoSAR2Height":
        from tomosar2height_tpu.models.model import TomoSAR2Height

        return TomoSAR2Height
    raise AttributeError(name)
