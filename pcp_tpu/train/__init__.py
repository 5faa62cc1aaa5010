from .optimization import build_optimizer
from .train_state import TrainState, create_train_state, make_train_step, make_eval_step
