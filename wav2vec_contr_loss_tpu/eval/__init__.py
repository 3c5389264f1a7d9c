from . import extract, metrics, score  # noqa: F401
