from noetic_slam_tpu.ops.pallas.nn_kernel import nn1_fused  # noqa: F401
