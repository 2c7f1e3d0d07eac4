import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from ml4logs_spark.session import get_spark

    s = get_spark(app_name="ml4logs_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def turns(spark):
    from ml4logs_spark.datagen import transcripts as tx

    return tx.transcripts(spark, SF_DIR).cache()


@pytest.fixture(scope="session")
def turns_pdf(turns):
    return turns.toPandas()
