from __future__ import annotations

import pytest

from pdf_to_text_spark.fixtures import write_corpus
from pdf_to_text_spark.session import get_spark

TINY_ROWS = 120
SEED = 42


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pdf_to_text_spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), TINY_ROWS, SEED)
    return str(d)


@pytest.fixture(scope="session")
def pages_df(spark, corpus_dir):
    return spark.read.parquet(f"{corpus_dir}/pages.parquet")


@pytest.fixture(scope="session")
def golden_extracted(spark, corpus_dir):
    return spark.read.parquet(f"{corpus_dir}/golden_extracted.parquet")


@pytest.fixture(scope="session")
def golden_pages(spark, corpus_dir):
    return spark.read.parquet(f"{corpus_dir}/golden_pages.parquet")
