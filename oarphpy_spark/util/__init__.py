from oarphpy_spark.util.misc import (  # noqa: F401
    as_row_of_constants,
    get_size_of_deep,
    ichunked,
    roundrobin,
    stable_hash,
)
from oarphpy_spark.util.thruput import ThruputObserver  # noqa: F401
