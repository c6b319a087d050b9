"""far_tpu — a TPU-native relative camera pose estimation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of FAR
(Flexible, Accurate and Robust 6DoF Relative Camera Pose Estimation,
CVPR 2024; reference implementation crockwell/far). The design is
TPU-first:

- all geometry/solver math is batched, statically shaped, and jittable
  (the reference round-trips to OpenCV on the CPU for every pose);
- the matcher/regressor stack is Flax with fused attention paths;
- distribution is a `jax.sharding.Mesh` + collective design rather than
  NCCL DDP.

Subpackages
-----------
geometry   pure-jnp rotation / epipolar / triangulation kernels
solvers    robust estimation (prior-biased batched RANSAC, pose recovery)
models     Flax model zoo (LoFTR matcher, FAR regressor, ViTEss, 6DReg)
ops        Pallas TPU kernels + jnp fallbacks
train      pjit data-parallel trainer, optimizers, checkpointing
data       dataset adapters, samplers, synthetic data
eval       metric suites and offline benchmark scorers
utils      config tree and misc helpers
"""

__version__ = "0.1.0"

# Platform escape hatch: FAR_TPU_PLATFORM=cpu forces the CPU backend
# before any JAX backend initializes. Needed on hosts whose interpreter
# registers a TPU PJRT plugin at startup (sitecustomize) where the
# JAX_PLATFORMS env var alone is ignored — e.g. to run the CLIs while
# another process holds the single TPU.
import os as _os

if _os.environ.get("FAR_TPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["FAR_TPU_PLATFORM"])
