from recommend_tpu.models.retrieval import RetrievalTower
from recommend_tpu.models.losses import (
    in_batch_softmax_loss,
    multi_task_bce_loss,
)
