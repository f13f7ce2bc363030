"""Session-scoped Ray fixture: init ONCE per pytest session."""

from __future__ import annotations

import logging
import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def small_corpus_dir() -> str:
    from data_deduplication_service_ray.sources.corpus import corpus_path

    return corpus_path(200, seed=42)


@pytest.fixture(scope="session")
def t2_corpus_dir() -> str:
    from data_deduplication_service_ray.sources.corpus import corpus_path

    return corpus_path(2000, seed=42)
