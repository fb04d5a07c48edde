"""recommend_tpu — a TPU-native recommendation framework (JAX/XLA/Pallas/pjit).

Brand-new implementation of the capabilities of the `ScottHCL/recommend`
reference (see SURVEY.md): a multi-interest retrieval tower (KuaiFormer
capabilities) and a unified ranking transformer (OneTrans capabilities) on a
shared core of configs, ops, data pipelines, training, evaluation, and
serving — designed TPU-first (SPMD meshes, functional transforms, Pallas
kernels for the hot paths).
"""

__version__ = "0.1.0"

from recommend_tpu.config import (
    RetrievalConfig,
    RankingConfig,
    get_config,
    load_config,
    save_config,
)
