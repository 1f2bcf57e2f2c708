import pytest

from tecs_hardware_kbc_spark.corpus import corpus_to_dataframes, generate_corpus
from tecs_hardware_kbc_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=4,
                  app_name="kbc-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_corpus():
    return generate_corpus(n_pages=40, seed=42)


@pytest.fixture(scope="session")
def tiny_tables(spark, tiny_corpus):
    pages, gold, gaz = corpus_to_dataframes(spark, tiny_corpus)
    return {"pages": pages.cache(), "gold": gold.cache(), "gaz": gaz.cache()}
