from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from xapian_spark.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark(app_name="xapian-spark-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()


# The six paragraphs of the reference's apitest_simpledata fixture style:
# short hand-written English paragraphs with known term statistics.  These
# are NOT copied from the reference test data; they are our own fixture with
# the same role (tests/testdata/apitest_simpledata.txt in the reference).
SIMPLE_PARAGRAPHS = [
    "This is a test paragraph about search engines and ranking.",
    "A second paragraph mentions search once and indexing twice; "
    "indexing matters.",
    "Paragraph three is about something else entirely, like cooking pasta.",
    "The fourth paragraph talks about ranking functions and weighting "
    "schemes in a paragraph.",
    "Fifth: a paragraph with banana banana banana repeated words.",
    "Completely unrelated text about gardening tools and a rusty spade.",
]


@pytest.fixture(scope="session")
def simple_corpus(spark):
    rows = [
        (i + 1, f"repo{i % 2}", f"doc/{i}.txt", f"c{i:04d}", "txt", text)
        for i, text in enumerate(SIMPLE_PARAGRAPHS)
    ]
    return spark.createDataFrame(
        rows, "docid long, repo string, path string, commit string, "
              "lang string, content string"
    )


@pytest.fixture(scope="session")
def simple_index(spark, simple_corpus):
    from xapian_spark.index.builder import build_index, persist_index

    idx = build_index(
        spark, simple_corpus, content_col="content", docid_col="docid",
        prefix_fields={"lang": "L", "repo": "R"},
    )
    return persist_index(idx)
