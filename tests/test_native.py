"""Native C++ batcher vs pure-Python pipeline: must produce identical batches."""

import numpy as np
import pytest

from recommend_tpu.config import get_config
from recommend_tpu.data.pipeline import retrieval_batches
from recommend_tpu.data.synthetic import make_retrieval_data
from recommend_tpu.data.native import AliasSampler, load_native


@pytest.fixture(scope="module")
def lib():
    lib = load_native()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_native_batches_match_python(lib):
    cfg = get_config("retrieval_small", max_seq_len=32,
                     compression_schedule=((16, 8), (16, 1)))
    data = make_retrieval_data(cfg, num_users=30, num_videos=200, seed=0)
    # same seed → same example order → identical batches
    b_native = next(iter(retrieval_batches(data, cfg, 16, seed=5, use_native=True)))
    b_python = next(iter(retrieval_batches(data, cfg, 16, seed=5, use_native=False)))
    for k in b_python["history"]:
        np.testing.assert_array_equal(
            b_native["history"][k], b_python["history"][k], err_msg=k
        )
        np.testing.assert_array_equal(b_native["target"][k], b_python["target"][k])
    np.testing.assert_array_equal(b_native["history_valid"], b_python["history_valid"])
    np.testing.assert_allclose(
        b_native["target_popularity"], b_python["target_popularity"], rtol=1e-6
    )


def test_alias_sampler_distribution(lib):
    probs = np.array([0.5, 0.25, 0.125, 0.125])
    s = AliasSampler(lib, probs, seed=42)
    draws = s.sample(200_000)
    freq = np.bincount(draws, minlength=4) / len(draws)
    np.testing.assert_allclose(freq, probs, atol=0.01)


def test_alias_sampler_exclusion(lib):
    probs = np.ones(100)
    s = AliasSampler(lib, probs, seed=1)
    out = s.sample_distinct_excluding(10, exclude=[0, 1, 2, 3, 4])
    assert len(set(out.tolist())) == 10
    assert not set(out.tolist()) & {0, 1, 2, 3, 4}


def test_alias_sampler_exclusion_tight(lib):
    """num == n - n_exclude forces the deterministic fallback path."""
    probs = np.ones(10)
    s = AliasSampler(lib, probs, seed=2)
    out = s.sample_distinct_excluding(7, exclude=[0, 1, 2])
    assert sorted(out.tolist()) == [3, 4, 5, 6, 7, 8, 9]
