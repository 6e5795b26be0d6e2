from multimodal_lipread_tpu.train.schedule import ReduceLROnPlateau  # noqa: F401
from multimodal_lipread_tpu.train.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
from multimodal_lipread_tpu.train.trainer import (  # noqa: F401
    ArrayDataset,
    EpochMetrics,
    Trainer,
    TrainerConfig,
)
