from .compression import CompressionModule, clip_embedding  # noqa: F401
from .heads import (  # noqa: F401
    LinearBinaryHead,
    SmallMLPBinaryHead,
    SpoofDetector,
    build_head,
)
from .hf_convert import config_from_hf, convert_hf_state_dict, load_pretrained  # noqa: F401
from .wav2vec2 import (  # noqa: F401
    LARGE_960H,
    XLSR_300M,
    Wav2Vec2Config,
    Wav2Vec2Encoder,
    feature_frame_length,
)
