"""spsg_tpu — TPU-native self-supervised scene generation with semantic segmentation.

A ground-up JAX/Flax/Pallas/pjit rebuild of the capabilities of
`HaileyMai/Self-supervised-scene-generation-with-semantic-segmentation`
(SPSG, Dai et al. CVPR 2021, extended with 14-class semantics).

Layers (mirrors SURVEY.md §1, redesigned TPU-first):
  - ``spsg_tpu.data``      : binary voxel-grid file formats, color spaces, host data pipeline
  - ``spsg_tpu.models``    : Flax generator (two-branch 3D conv U-Net) + 2D SN patch discriminator
  - ``spsg_tpu.ops``       : differentiable TSDF raycaster, depth-map ops, 3D normals,
                             marching cubes (host) — TPU-native replacements of the
                             reference CUDA/C++ extensions
  - ``spsg_tpu.losses``    : 3D geo/occ/semantic losses, 2D view-guided losses, GAN, style
  - ``spsg_tpu.parallel``  : device mesh + sharding helpers (data parallel over ICI,
                             spatial decomposition of whole scenes)
  - ``spsg_tpu.training``  : jitted train step, optimizers, checkpointing, train loop
  - ``spsg_tpu.inference`` : chunked whole-scene inference with overlap stitching, metrics
  - ``spsg_tpu.datagen``   : offline TSDF fusion + semantic splatting (dataset generation)

All dense volumetric tensors are channel-last (B, Z, Y, X, C) — NDHWC — for TPU
conv efficiency; the grid axes follow the reference's zyx ordering
(reference: torch/data_util.py:47-54).
"""

__version__ = "0.1.0"
