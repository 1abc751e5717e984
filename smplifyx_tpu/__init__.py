"""smplifyx_tpu — TPU-native batched SMPLify-X fitting for partially-observed humans.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``xiyichen/smplify-x-partial`` (optimization-based SMPL-X fitting to 2D
keypoints with confidence-calibrated keypoint blending, regression priors, and
cropped-EHF evaluation).  The architecture inverts the reference's
one-image-at-a-time, host-looped L-BFGS into a frame-batched, jit-compiled,
vmapped pipeline that shards over TPU device meshes.

Layout (maps to reference layers, see SURVEY.md):
  ops/        rotation, camera projection, robustifiers, Procrustes, collision
  models/     functional SMPL-X forward, synthetic model artifacts, VPoser (Flax)
  priors/     GMM / L2 / angle pose priors
  fitting/    parameter packing, energies, batched strong-Wolfe L-BFGS, staged driver
  parallel/   device-mesh sharding of the frame batch
  data/       keypoint readers, blending+calibration, regression-prior loaders
  evaluation/ alignment metrics and the cropped-EHF protocol
  utils/      config system, result/mesh IO
"""

__version__ = "0.1.0"
