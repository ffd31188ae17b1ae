from .losses import fourier_split, star_sr_loss
from .trainer import (TrainConfig, TrainState, is_trainable, make_optimizer,
                      make_train_state, make_train_step, trainable_mask)
