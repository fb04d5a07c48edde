from recommend_tpu.llm4rec.semantic_distill import (
    SemanticDistillConfig,
    SemanticDistillModel,
    semantic_distill_loss,
)
from recommend_tpu.llm4rec.intent_cache import IntentCache
from recommend_tpu.llm4rec.prompts import (
    INTENT_AXES,
    IntentPromptGenerator,
    PromptSpec,
    intent_specs,
)
from recommend_tpu.llm4rec.semantic_ids import (
    SemanticIdMap,
    build_semantic_ids,
    remap_retrieval_data,
)
