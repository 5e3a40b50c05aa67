"""Query modules. Importing this package registers every query."""

import hailstorm_spark.queries.wordcount  # noqa: F401
