"""Query modules. Importing this package registers every query.

IMPORT ORDER IS LOAD-BEARING: the driver's correctness harness checks
queries in registration (= import) order and caps at ~50 entries per
round. Parity-critical and north-star queries register first
(wordcount — the reference's own topology — windows, TPC-H relational,
streaming, events, dedup, similarity, text); trivially-correct scalar /
setop variants register last and are covered by the identical local
DuckDB-oracle pytest sweep instead.
"""

import hailstorm_spark.queries.wordcount  # noqa: F401
import hailstorm_spark.queries.windows  # noqa: F401
import hailstorm_spark.queries.relational  # noqa: F401
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
