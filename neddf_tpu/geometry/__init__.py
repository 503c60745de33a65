from neddf_tpu.geometry.se3 import (  # noqa: F401
    aligned_pose_error,
    camera_pose,
    rodrigues,
    umeyama_alignment,
)
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
