"""Query modules. Importing this package registers every query.

Check ordering is controlled by ``registry.CHECK_FIRST`` (the driver's
correctness harness caps at ~50 entries per round); import order here
only breaks ties for queries not in that list. Everything registered is
additionally swept against the identical DuckDB oracle by
tests/test_oracle_parity.py regardless of window position.
"""

import hailstorm_spark.queries.wordcount  # noqa: F401
import hailstorm_spark.queries.windows  # noqa: F401
import hailstorm_spark.queries.relational  # noqa: F401
import hailstorm_spark.queries.relational_deep  # noqa: F401
import hailstorm_spark.queries.relational_full  # noqa: F401
import hailstorm_spark.queries.streaming_queries  # noqa: F401
import hailstorm_spark.queries.events  # noqa: F401
import hailstorm_spark.queries.asof  # noqa: F401
import hailstorm_spark.queries.dedup  # noqa: F401
import hailstorm_spark.queries.similarity  # noqa: F401
import hailstorm_spark.queries.textstats  # noqa: F401
import hailstorm_spark.queries.aggregates  # noqa: F401
import hailstorm_spark.queries.multimodal  # noqa: F401
import hailstorm_spark.queries.joins  # noqa: F401
import hailstorm_spark.queries.setops  # noqa: F401
import hailstorm_spark.queries.sql_api  # noqa: F401
import hailstorm_spark.queries.scalar  # noqa: F401
import hailstorm_spark.queries.corpus_pipeline  # noqa: F401
import hailstorm_spark.queries.corpus_extras  # noqa: F401
import hailstorm_spark.queries.approx  # noqa: F401
import hailstorm_spark.queries.udtf_api  # noqa: F401
import hailstorm_spark.queries.pysource  # noqa: F401
import hailstorm_spark.queries.layout  # noqa: F401
import hailstorm_spark.queries.matview  # noqa: F401
import hailstorm_spark.queries.integrity  # noqa: F401
import hailstorm_spark.queries.io_roundtrip  # noqa: F401
