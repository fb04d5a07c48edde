from recommend_tpu.data.synthetic import (
    SyntheticRetrievalData,
    SyntheticRankingData,
    make_retrieval_data,
    make_ranking_data,
)
from recommend_tpu.data.sampler import NegativeSampler
from recommend_tpu.data.pipeline import (
    retrieval_batches,
    ranking_batches,
)
