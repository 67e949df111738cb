from oarphpy_spark.codec.tensor import Tensor, TENSOR_PACK_MIN_BYTES  # noqa: F401
from oarphpy_spark.codec.callables import CloudpickeledCallable  # noqa: F401
from oarphpy_spark.codec.row_adapter import RowAdapter  # noqa: F401
