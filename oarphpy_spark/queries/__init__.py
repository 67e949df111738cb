"""Query definitions, grouped by SURVEY.md §2 category.

Importing this package registers every declared query into
``oarphpy_spark.registry``.
"""

import oarphpy_spark.queries.codec_queries  # noqa: F401
import oarphpy_spark.queries.fidelity  # noqa: F401
import oarphpy_spark.queries.inventory_extras  # noqa: F401
import oarphpy_spark.queries.joins  # noqa: F401
import oarphpy_spark.queries.llm_queries  # noqa: F401
import oarphpy_spark.queries.relational  # noqa: F401
import oarphpy_spark.queries.scalar_fns  # noqa: F401
import oarphpy_spark.queries.sql_api  # noqa: F401
import oarphpy_spark.queries.windows_events  # noqa: F401
