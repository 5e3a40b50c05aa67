"""Query modules. Importing this package registers every query."""

import hailstorm_spark.queries.aggregates  # noqa: F401
import hailstorm_spark.queries.dedup  # noqa: F401
import hailstorm_spark.queries.events  # noqa: F401
import hailstorm_spark.queries.joins  # noqa: F401
import hailstorm_spark.queries.multimodal  # noqa: F401
import hailstorm_spark.queries.relational  # noqa: F401
import hailstorm_spark.queries.scalar  # noqa: F401
import hailstorm_spark.queries.setops  # noqa: F401
import hailstorm_spark.queries.similarity  # noqa: F401
import hailstorm_spark.queries.streaming_queries  # noqa: F401
import hailstorm_spark.queries.textstats  # noqa: F401
import hailstorm_spark.queries.windows  # noqa: F401
import hailstorm_spark.queries.wordcount  # noqa: F401
