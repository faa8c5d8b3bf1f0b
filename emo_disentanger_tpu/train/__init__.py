from .trainer import (
    OptimizerConfig, TrainState, make_optimizer, make_train_step,
    make_eval_step, init_train_state, accuracy_sums, finalize_accuracy,
    dropout_rng, stage1_loss_fn, stage2_performer_loss_fn,
    stage2_gpt2_loss_fn,
)
from .schedule import warmup_cosine
from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
