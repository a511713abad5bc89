"""xapian_spark: a PySpark-native inverted-index + BM25 engine.

Brand-new implementation of the query/data-processing capabilities of
ojwb/xapian (reference read-only at /root/reference), re-expressed
Spark-first: DataFrame plans, Arrow-batched UDFs, shuffle-based index build.
"""

from xapian_spark.index.builder import (  # noqa: F401
    InvertedIndex,
    build_index,
    read_index,
    write_index,
)
from xapian_spark.query.planner import Planner  # noqa: F401
from xapian_spark.ranking.weights import BM25Weight  # noqa: F401
from xapian_spark.session import get_spark  # noqa: F401

# reference-bindings surface (a user of the reference imports these same
# nouns from `xapian`)
from xapian_spark.api import (  # noqa: F401
    Database,
    Enquire,
    ESet,
    InMemoryDatabase,
    MSet,
    MSetItem,
    MultiValueKeyMaker,
    Registry,
    RSet,
    ValueSetMatchDecider,
    WritableDatabase,
)
from xapian_spark.index.compactor import Compactor  # noqa: F401
from xapian_spark.query.parser import QueryParser  # noqa: F401
from xapian_spark.text.stem import Stemmer  # noqa: F401
from xapian_spark.text.termgen import Document, TermGenerator  # noqa: F401
