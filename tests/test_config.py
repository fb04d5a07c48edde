import dataclasses

import pytest

from recommend_tpu.config import (
    RankingConfig,
    RetrievalConfig,
    get_config,
    load_config,
    save_config,
)


def test_presets_exist():
    for name in ("retrieval_base", "retrieval_small", "ranking_base",
                 "ranking_small", "ranking_large"):
        cfg = get_config(name)
        assert cfg is not None


def test_retrieval_defaults_match_reference():
    # kuaiformer config.py:13-25 values
    cfg = get_config("retrieval_base")
    assert cfg.embed_dim == 128
    assert cfg.num_layers == 6
    assert cfg.num_heads == 8
    assert cfg.ffn_dim == 512
    assert cfg.max_seq_len == 256
    assert cfg.num_query_tokens == 4
    assert cfg.num_compressed_tokens == 55  # 2 + 5 + 48


def test_ranking_defaults_match_reference():
    # oneTrans config.py:14-33 values
    cfg = get_config("ranking_base")
    assert cfg.embed_dim == 384
    assert cfg.num_layers == 8
    assert cfg.num_ns_tokens == 12
    assert len(cfg.pyramid_ratios) == cfg.num_layers
    assert cfg.gradient_clip_norm == 90.0
    assert cfg.dense_lr == 0.005 and cfg.sparse_lr == 0.1


def test_json_round_trip(tmp_path):
    for name in ("retrieval_small", "ranking_small"):
        cfg = get_config(name)
        p = tmp_path / f"{name}.json"
        save_config(cfg, str(p))
        cfg2 = load_config(str(p))
        assert cfg == cfg2


def test_overrides():
    cfg = get_config("ranking_small", num_layers=2, pyramid_ratios=(0.5, 0.25))
    assert cfg.num_layers == 2


def test_invalid_schedule_rejected():
    with pytest.raises(AssertionError):
        RetrievalConfig(max_seq_len=100, compression_schedule=((64, 8), (16, 1)))
    with pytest.raises(AssertionError):
        RankingConfig(num_layers=3, pyramid_ratios=(0.5, 0.5))
