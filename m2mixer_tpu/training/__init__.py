from . import metrics  # noqa: F401
from .callbacks import CheckpointManager, EarlyStopping, ReduceLROnPlateau  # noqa: F401
from .loggers import ExperimentLogger  # noqa: F401
from .trainer import Trainer, seed_everything  # noqa: F401
