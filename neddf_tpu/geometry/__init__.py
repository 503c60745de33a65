from neddf_tpu.geometry.se3 import rodrigues, camera_pose  # noqa: F401
from neddf_tpu.geometry.camera import (  # noqa: F401
    PinholeCalib,
    create_rays,
    project,
    unproject,
)
from neddf_tpu.geometry.rays import (  # noqa: F401
    Rays,
    Sampling,
    get_sampling_cones,
    get_sampling_points,
)
