from gaussian_splatterer_tpu.train.densify import DensifyParams, densify  # noqa: F401
from gaussian_splatterer_tpu.train.schedule import auto_train  # noqa: F401
from gaussian_splatterer_tpu.train.trainer import (  # noqa: F401
    CameraBatch,
    LearningRates,
    Trainer,
    TrainMetrics,
    make_train_step,
    randomize_rig_rotations,
)
