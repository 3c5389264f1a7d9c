from . import checkpoint  # noqa: F401
from .baseline import BaselineState, BaselineTrainer  # noqa: F401
from .schedule import alpha_for_epoch  # noqa: F401
from .stage1 import Stage1State, Stage1Trainer  # noqa: F401
from .stage2 import Stage2State, stage2_scores, train_stage2  # noqa: F401
