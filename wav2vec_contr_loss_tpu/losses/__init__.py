from .supcon import (  # noqa: F401
    SupConConfig,
    pairwise_similarity,
    supcon_binary_loss,
    supcon_multiclass_loss,
    uniformity_loss,
)
from .bce import bce_logits_loss, pos_weight_from_labels  # noqa: F401
