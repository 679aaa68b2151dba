from noetic_slam_tpu.ops.imu import integrate_imu, slice_imu_window  # noqa: F401
from noetic_slam_tpu.ops.pointcloud import (  # noqa: F401
    crop_box,
    prepare_scan,
    voxel_downsample,
)
