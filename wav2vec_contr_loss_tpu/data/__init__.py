from .audio import AudioConfig, AudioLoader, load_waveform, pad_or_trim  # noqa: F401
from .cache import attach_cache, build_cache  # noqa: F401
from .pipeline import Batch, BatchPipeline, prefetch_to_device  # noqa: F401
from .protocols import (  # noqa: F401
    SpoofDataset,
    Utterance,
    parse_asvspoof2019,
    parse_asvspoof2021,
    parse_common_voice,
    parse_famous_figures,
    parse_in_the_wild,
    parse_ravdess,
)
from .rawboost import RawBoostParams, apply_rawboost, apply_rawboost_batch  # noqa: F401
from .sampler import BalancedBatchSampler  # noqa: F401
