from oarphpy_spark.operators.union import union_dfs  # noqa: F401
from oarphpy_spark.operators.sampling import (  # noqa: F401
    balanced_sample_deterministic,
    get_balanced_sample,
)
from oarphpy_spark.operators.histogram import (  # noqa: F401
    assign_buckets,
    df_histogram,
    histogram_with_examples,
)
from oarphpy_spark.operators.skew import salted_agg, salted_broadcast_join  # noqa: F401
from oarphpy_spark.operators.bucketing import bucketed_join, write_bucketed  # noqa: F401
