from .logging import MetricsLogger  # noqa: F401
from .preemption import PreemptionGuard  # noqa: F401
from .seeding import set_seed  # noqa: F401
from .timing import StepTimer, Throughput  # noqa: F401
