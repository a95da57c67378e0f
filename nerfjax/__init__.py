"""nerfjax — TPU-native NeRF reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild of the DeepFields-NeRF pipeline
(reference: mohamedhaiham94/DeepFields-NeRF-): posed photographs -> COLMAP
poses -> normalized scene -> precomputed rays -> NeRF / Instant-NGP field
training -> dense colored occupancy volume -> sliced point cloud ->
napari/paraview/vti exports.

Design notes (TPU-first, not a port):
  * The whole render+loss+grad+update path is ONE jitted train step;
    no python-side chunking (XLA tiles the [B*S, .] point tensors onto the MXU).
  * Data parallelism over rays via a 1-D `jax.sharding.Mesh`; gradients are
    reduced over ICI by XLA-inserted collectives (params replicated).
  * bf16 compute / fp32 params instead of CUDA AMP + GradScaler.
  * The Instant-NGP hash encoding + fused small MLPs (tiny-cuda-nn in the
    reference) are implemented natively: jnp gather baseline + Pallas kernels.
"""

__version__ = "0.1.0"
