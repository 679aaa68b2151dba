from noetic_slam_tpu.models.odometry import (  # noqa: F401
    OdomState,
    StepInput,
    StepOutput,
    init_state,
    make_odometry_step,
)
