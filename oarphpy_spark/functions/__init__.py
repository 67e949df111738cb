from oarphpy_spark.functions.vectors import cosine, dot, l2_norm  # noqa: F401
from oarphpy_spark.functions.text import (  # noqa: F401
    norm_tokens,
    shingles,
    token_md5s,
)
