from . import metrics, score  # noqa: F401
