from .step import TrainState, make_train_step, default_class_weights
from .loss import reviser_loss

__all__ = ["TrainState", "make_train_step", "default_class_weights", "reviser_loss"]
