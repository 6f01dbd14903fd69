from .schedule import cosine_annealing_warm_restarts  # noqa: F401
from .optimizer import OptimizerConfig, build_optimizer  # noqa: F401
from .metrics import Metrics  # noqa: F401
from .train_step import TrainStepConfig, make_train_step, make_eval_step  # noqa: F401
from .checkpoint import (  # noqa: F401
    TrainState,
    save_checkpoint,
    restore_checkpoint,
    restore_with_new_optimizer,
    latest_checkpoint_path,
)
from .opt import setup_seeds, calculate_iterable_dataset_num_samples  # noqa: F401
