from neddf_tpu.training.losses import (  # noqa: F401
    BaseLoss,
    ColorLoss,
    FieldsConstraintLoss,
    MaskBCELoss,
    MaskMSELoss,
)
from neddf_tpu.training.logger import BaseLogger, NeRFTBLogger  # noqa: F401
from neddf_tpu.training.metrics import (  # noqa: F401
    peak_signal_noise_ratio,
    structural_similarity,
)
from neddf_tpu.training.trainer import BaseTrainer, NeRFTrainer  # noqa: F401
from neddf_tpu.training.checkpoint import (  # noqa: F401
    import_torch_state_dict,
    load_pytree,
    save_pytree,
)
