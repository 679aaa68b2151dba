from noetic_slam_tpu.config.params import (  # noqa: F401
    DlioConfig,
    ExtrinsicsConfig,
    GeoConfig,
    GicpConfig,
    ImuConfig,
    KeyframeConfig,
    MapConfig,
    PreprocConfig,
    SubmapConfig,
    TsdfConfig,
    CapacityConfig,
    load_config,
)
