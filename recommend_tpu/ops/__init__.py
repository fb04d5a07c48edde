from recommend_tpu.ops.normalization import RMSNorm
from recommend_tpu.ops.attention import MultiHeadAttention, causal_band_mask
from recommend_tpu.ops.transformer import TransformerBlock
