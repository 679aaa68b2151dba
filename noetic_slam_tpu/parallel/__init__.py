from noetic_slam_tpu.parallel.mesh import make_mesh  # noqa: F401
from noetic_slam_tpu.parallel.registration import (  # noqa: F401
    sharded_gicp_align,
)
