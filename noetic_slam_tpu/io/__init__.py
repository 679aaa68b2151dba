from noetic_slam_tpu.io.export import write_pcd, write_ply  # noqa: F401
from noetic_slam_tpu.io.mulran import MulranDataset  # noqa: F401
from noetic_slam_tpu.io.replay import ReplayClock, replay_dataset  # noqa: F401
