"""nerf_projects_tpu — a TPU-native radiance-field framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of the `isaacchunn/nerf-projects`
suite (vanilla NeRF, NeRF-SH + PlenOctree, Plenoxels sparse voxels) designed
for TPU hardware: jit/shard_map data parallelism over ICI meshes, MXU-shaped
MLP evaluation, Pallas kernels for the grid/octree ray-marching hot paths,
and fp32-accurate volume-rendering numerics for PSNR parity.

Subpackages
-----------
core      : pytree primitives — Rays, Cameras, chunking/sharding helpers
ops       : rendering math — posenc, sampling, compositing, SH/SG, grids
models    : field representations — NeRF MLP, NeRF-SH, SparseGrid, PlenOctree
data      : dataset loaders (blender/llff/deepvoxels/linemod/nsvf) + synthetic
parallel  : device-mesh construction and sharded train/render steps
train     : training drivers for the three method families
pipeline  : NeRF -> PlenOctree extraction / finetune / compression
obs       : metrics, JSON logging, memory tracking, analysis
utils     : config system, misc
"""

__version__ = "0.1.0"
