from recommend_tpu.training.optimizer import (
    make_retrieval_optimizer,
    make_ranking_optimizer,
    warmup_cosine_schedule,
)
from recommend_tpu.training.metrics import (
    hit_rate_at_k,
    ndcg_at_k,
    mrr,
    streaming_auc,
)
