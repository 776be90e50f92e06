from __future__ import annotations

import pytest

from entity_linking_in_biomedical_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("el-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    from entity_linking_in_biomedical_spark.sources.synthetic import synth_corpus

    return synth_corpus(n_docs=120, n_entities=50, seed=42)
