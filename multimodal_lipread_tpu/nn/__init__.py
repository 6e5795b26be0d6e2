from multimodal_lipread_tpu.nn.recurrent import LSTM, BiLSTM  # noqa: F401
from multimodal_lipread_tpu.nn.attention import (  # noqa: F401
    AdditiveAttention,
    PositionalEncoding,
    TransformerEncoder,
    TransformerEncoderLayer,
    MultiHeadSelfAttention,
    SingleQueryAttention,
)
from multimodal_lipread_tpu.nn.common import (  # noqa: F401
    ClassifierHead,
    MLP,
    adaptive_avg_pool2d,
    time_distributed,
)
