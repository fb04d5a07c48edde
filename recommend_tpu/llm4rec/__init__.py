from recommend_tpu.llm4rec.semantic_distill import (
    SemanticDistillConfig,
    SemanticDistillModel,
    semantic_distill_loss,
)
from recommend_tpu.llm4rec.intent_cache import IntentCache
