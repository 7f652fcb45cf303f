"""Training: optimizers, jitted steps, checkpointing."""

from nspeech_tpu.train.checkpoint import (  # noqa: F401
    CheckpointManager,
    load_serving_params,
)
from nspeech_tpu.train.loop import (  # noqa: F401
    TrainState,
    build_tacotron_train_step,
    build_wavenet_train_step,
    create_state,
)
from nspeech_tpu.train.metadata import (  # noqa: F401
    config_from_checkpoint,
    load_run_metadata,
    save_run_metadata,
)
from nspeech_tpu.train.optim import make_optimizer, make_schedule  # noqa: F401
