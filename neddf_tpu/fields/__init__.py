from neddf_tpu.fields.base import BaseField, Schedule, voxelize  # noqa: F401
from neddf_tpu.fields.nerf import NeRF  # noqa: F401
from neddf_tpu.fields.neddf import NeDDF  # noqa: F401
from neddf_tpu.fields.neus import NeuS  # noqa: F401
