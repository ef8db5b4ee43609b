import logging

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir():
    from go_distributed_log_search_ray.corpus.generator import generate
    return generate("/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf001():
    return "/root/testdata/sf0.001"
