import os

import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """1k-doc deterministic synthetic code corpus (FIXTURES.md §1, tiny)."""
    from fixtures.gen_corpus import generate_corpus

    out = str(tmp_path_factory.mktemp("corpus") / "tiny")
    generate_corpus(1000, out, seed=42, min_tokens=20, max_tokens=200, n_files=4)
    return out


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
