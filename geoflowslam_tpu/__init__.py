"""geoflowslam_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of GeoFlow-SLAM.

A from-scratch framework with the capabilities of HorizonRobotics/GeoFlowSlam
(tightly-coupled RGBD-inertial + legged-odometry SLAM on the ORB-SLAM3
architecture), re-designed for TPUs: fixed-shape padded state pytrees instead
of pointer graphs and mutexes, jit-compiled pipeline stages instead of
threads, batched Gauss-Newton/Schur bundle adjustment on the MXU instead of
g2o, and Pallas kernels for the image front-end.

See SURVEY.md at the repo root for the full map of reference components to
modules in this package.
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM geometry (Rodrigues/GN/Schur solves) needs true float32 matmuls; the
# default matmul precision on TPU (and this CPU backend) is bf16-grade, which
# corrupts rotation compositions at the 1e-2 level. Hot kernels that *want*
# bf16 (e.g. Hamming descriptor matmuls, ops/matching.py) cast their inputs
# to bfloat16 explicitly, so they keep full MXU throughput.
_jax.config.update("jax_default_matmul_precision", "highest")
