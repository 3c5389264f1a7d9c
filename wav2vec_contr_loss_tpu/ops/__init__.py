from .rawboost import rawboost_batch_device  # noqa: F401
