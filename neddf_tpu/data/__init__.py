from neddf_tpu.data.base import BaseDataset  # noqa: F401
from neddf_tpu.data.llff import LLFFDataset  # noqa: F401
from neddf_tpu.data.nerf_synthetic import NeRFSyntheticDataset  # noqa: F401
