import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.session import get_spark

    cfg = EngineConfig(shuffle_partitions=8)
    s = get_spark("tests", master="local[4]", config=cfg)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus_path(tmp_path_factory):
    """sf-tiny web_pages fixture (1,000 rows), written once per session."""
    from search_engine_spark.sources.fixtures import write_web_pages

    path = tmp_path_factory.mktemp("fixtures") / "web_pages_tiny.parquet"
    write_web_pages(str(path), 1000)
    return str(path)


@pytest.fixture(scope="session")
def tiny_corpus_rows(tiny_corpus_path):
    import pyarrow.parquet as pq

    t = pq.read_table(tiny_corpus_path)
    return list(
        zip(
            t["url"].to_pylist(),
            t["warc_ts"].to_pylist(),
            t["text"].to_pylist(),
        )
    )
