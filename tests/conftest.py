"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def pytest_configure(config):
    import warnings

    # Ray's repartition() touches its own deprecated
    # use_push_based_shuffle context property (one warning per call);
    # internal-to-Ray noise, not actionable from this repo
    warnings.filterwarnings(
        "ignore", message=".*use_push_based_shuffle.*"
    )


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    return FIXTURES


CORPUS_N_DOCS = 96
CORPUS_SEED = 42
CORPUS_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def corpus_root(ray_session, tmp_path_factory) -> pathlib.Path:
    from promptner_ray.sources.corpus import ensure_corpus

    return ensure_corpus(
        tmp_path_factory.mktemp("corpus"),
        n_docs=CORPUS_N_DOCS,
        seed=CORPUS_SEED,
        sf_dir=CORPUS_SF_DIR,
    )
