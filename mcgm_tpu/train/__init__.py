from .optim import make_optimizer, Scheduler, set_learning_rate, get_learning_rate  # noqa: F401
from .state import TrainState, split_variables, merge_variables  # noqa: F401
