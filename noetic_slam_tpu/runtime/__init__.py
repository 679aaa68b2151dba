from noetic_slam_tpu.runtime.pipeline import OdometryPipeline  # noqa: F401
