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
