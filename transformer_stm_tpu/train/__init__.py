"""Training subsystem: optimizer, LR schedule, jitted loop, checkpointing,
metrics/records, and the Keras/h5 weight-import compatibility path."""

from .optimizer import adam_init, adam_update, lr_at_epoch  # noqa: F401
from .loop import TrainLoop, make_train_step, make_eval_step  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint  # noqa: F401
from .metrics import r2_score, mse, mae, RecordsWriter  # noqa: F401
