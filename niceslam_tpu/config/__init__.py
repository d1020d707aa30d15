from .schema import (  # noqa: F401
    CamConfig,
    MappingConfig,
    SLAMConfig,
    StageLR,
    TrackingConfig,
    load_config,
)
