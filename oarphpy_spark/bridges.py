"""DataFrame -> ML-framework feed bridges.

Capability parity with the reference's ``spark_df_to_tf_dataset``
(reference ``oarphpy/spark.py:1257-1380``), redesigned: the reference
ran one full Spark job per shard (filter + repartition(100) +
toLocalIterator, ~9 s per 786 KB shard in its own perf notebook). Here
a single job streams Arrow-converted partitions to the driver with
prefetch; batches come out as pandas/numpy dicts ready for
``tf.data.Dataset.from_generator`` / torch ``IterableDataset``.

The tf/torch wrappers are import-gated (frameworks not installed in
this environment); the batch iterator itself is fully functional and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame


def iter_arrow_batches(
    df: DataFrame, prefetch_partitions: bool = True
) -> Iterator["pyarrow.RecordBatch"]:  # noqa: F821
    """Stream a DataFrame to the driver as Arrow RecordBatches,
    memory-bounded: one partition in flight (+1 prefetched), never a
    full collect.

    PySpark exposes no Arrow-native local iterator —
    ``toLocalIterator`` deserializes pickled Rows one at a time, which
    is exactly the per-row overhead an ML feed path cannot afford. So
    each executor-side Arrow batch is re-serialized to Arrow IPC bytes
    as a single ``binary`` cell via ``mapInArrow`` (columnar end to
    end, no per-row Python objects on the executor either), and the
    driver pays the row-iterator cost once per *batch* (~10k rows,
    ``spark.sql.execution.arrow.maxRecordsPerBatch``) instead of once
    per row.
    """
    import pyarrow as pa

    def to_ipc(batches):
        for batch in batches:
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, batch.schema) as writer:
                writer.write_batch(batch)
            yield pa.RecordBatch.from_pydict(
                {"ipc": [sink.getvalue().to_pybytes()]}
            )

    ipc_df = df.mapInArrow(to_ipc, "ipc binary")
    for row in ipc_df.toLocalIterator(prefetchPartitions=prefetch_partitions):
        with pa.ipc.open_stream(row["ipc"]) as reader:
            yield from reader


def _columns_of(table) -> dict[str, Any]:
    """Arrow table -> {col: numpy array} — zero-copy for numeric
    columns, object arrays for strings/binary/nested. (``to_pydict``
    would rebuild every cell as a Python object and forfeit the
    columnar win.)"""
    return {
        name: table.column(name).combine_chunks().to_numpy(zero_copy_only=False)
        for name in table.column_names
    }


def iter_row_batches(
    df: DataFrame, batch_size: int = 1024, prefetch_partitions: bool = True
) -> Iterator[dict[str, Any]]:
    """Stream a DataFrame as column-dict batches (numpy-valued) of
    exactly ``batch_size`` rows (except the last), memory-bounded.
    Built on :func:`iter_arrow_batches`; re-chunking is zero-copy
    Arrow slices."""
    import pyarrow as pa

    buf: "pa.Table | None" = None
    for batch in iter_arrow_batches(df, prefetch_partitions):
        t = pa.Table.from_batches([batch])
        buf = t if buf is None else pa.concat_tables([buf, t])
        while buf.num_rows >= batch_size:
            yield _columns_of(buf.slice(0, batch_size))
            buf = buf.slice(batch_size)
    if buf is not None and buf.num_rows:
        yield _columns_of(buf)


def iter_shard_batches(
    df: DataFrame,
    shard_col: str,
    num_reader_threads: int = 2,
    batch_size: int = 1024,
    queue_maxsize: int | None = None,
    on_shard_start=None,
    on_shard_end=None,
    observer=None,
) -> Iterator[dict[str, Any]]:
    """Shard-parallel feed: the reference's interleave semantics
    (``oarphpy/spark.py:1257-1380`` — distinct shard ids, a reader
    threadpool, one Spark read per shard) WITHOUT requiring TensorFlow.

    * ``df.select(shard_col).distinct()`` lists the shards — bounded
      by contract, exactly as in the reference (:1317): the shard
      column is user-chosen to have manageable cardinality (e.g. a
      file/partition id), never a row-unique key.
    * ``num_reader_threads`` workers each claim shards from a work
      queue and stream ``df.filter(shard_col == id)`` through the
      Arrow batch path (:func:`iter_row_batches`) — each shard read is
      an independent Spark job whose equality filter prunes at the
      scan, so concurrent shard jobs keep the cluster busy while the
      driver consumes.
    * Batches land in a BOUNDED queue (back-pressure: readers block
      when the consumer lags, so driver memory is
      O(queue_maxsize × batch) regardless of table size).

    Yields the same column-dict batches as :func:`iter_row_batches`,
    shard-interleaved in nondeterministic order (it is a training
    feed). Worker exceptions propagate to the consumer. The optional
    ``on_shard_start``/``on_shard_end`` callbacks (called with the
    shard id, from the worker thread) exist for instrumentation and
    for tests proving genuine concurrency. Pass a ``ThruputObserver``
    (``util/thruput.py``) as ``observer`` to meter rows/bytes/chunk
    latency of the feed, the same metrology the reference wrapped
    around its TF bridge (``oarphpy/spark.py:1325-1357``).
    """
    import queue as _queue
    import sys as _sys
    import threading
    import time as _time

    from pyspark.sql import functions as F

    shard_ids = [r[0] for r in df.select(shard_col).distinct().collect()]
    if not shard_ids:
        return
    n_workers = max(1, min(num_reader_threads, len(shard_ids)))
    work: "_queue.Queue" = _queue.Queue()
    for sid in shard_ids:
        work.put(sid)
    out: "_queue.Queue" = _queue.Queue(
        maxsize=queue_maxsize or max(4, 2 * n_workers)
    )
    _DONE, _ERROR = object(), object()
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                try:
                    sid = work.get_nowait()
                except _queue.Empty:
                    break
                if on_shard_start is not None:
                    on_shard_start(sid)
                shard_df = df.filter(F.col(shard_col) == F.lit(sid))
                for batch in iter_row_batches(shard_df, batch_size):
                    if stop.is_set():
                        break  # consumer gone: stop mid-shard too
                    out.put(batch)
                if on_shard_end is not None and not stop.is_set():
                    on_shard_end(sid)
        except BaseException as ex:  # propagate to the consumer
            out.put((_ERROR, ex))
        finally:
            out.put(_DONE)

    threads = [
        threading.Thread(target=reader, name=f"shard-reader-{i}", daemon=True)
        for i in range(n_workers)
    ]
    for t in threads:
        t.start()
    done = 0
    try:
        while done < n_workers:
            t0 = _time.perf_counter()
            item = out.get()
            if item is _DONE:
                done += 1
            elif isinstance(item, tuple) and len(item) == 2 and item[0] is _ERROR:
                raise item[1]
            else:
                if observer is not None:
                    n = len(next(iter(item.values()))) if item else 0
                    nbytes = sum(
                        getattr(v, "nbytes", _sys.getsizeof(v))
                        for v in item.values()
                    )
                    observer.observe(
                        n=n, num_bytes=int(nbytes),
                        dt_sec=_time.perf_counter() - t0,
                    )
                yield item
    finally:
        # Consumer abandoned early: signal readers (they quit before
        # claiming another shard and between batches — unclaimed shard
        # jobs never launch), then drain so blocked put()s unwedge.
        stop.set()
        for t in threads:
            while t.is_alive():
                try:
                    out.get_nowait()
                except _queue.Empty:
                    t.join(timeout=0.1)


def to_tf_dataset(df: DataFrame, batch_size: int = 1024, shard_col: str | None = None,
                  num_reader_threads: int = 2):
    """``tf.data.Dataset`` over ``iter_row_batches`` (requires
    tensorflow on the driver)."""
    try:
        import tensorflow as tf  # noqa: F401
    except ImportError as ex:
        raise NotImplementedError(
            "to_tf_dataset requires tensorflow; wire "
            "tf.data.Dataset.from_generator(lambda: iter_row_batches(df)) "
            "with an output_signature matching df.schema"
        ) from ex
    import tensorflow as tf

    _TF_TYPES = {
        "bigint": tf.int64, "int": tf.int32, "smallint": tf.int32,
        "double": tf.float64, "float": tf.float32, "boolean": tf.bool,
        "string": tf.string, "binary": tf.string,
    }
    output_types = {
        name: _TF_TYPES.get(dtype, tf.string) for name, dtype in df.dtypes
    }

    def gen():
        if shard_col is not None:
            yield from iter_shard_batches(
                df, shard_col, num_reader_threads, batch_size
            )
        else:
            yield from iter_row_batches(df, batch_size)

    return tf.data.Dataset.from_generator(gen, output_types=output_types)


def to_torch_iterable(df: DataFrame, batch_size: int = 1024,
                      shard_col: str | None = None,
                      num_reader_threads: int = 2):
    """torch ``IterableDataset`` over the batch iterators (requires
    torch on the driver); pass ``shard_col`` for the shard-parallel
    read path."""
    try:
        import torch  # noqa: F401
    except ImportError as ex:
        raise NotImplementedError(
            "to_torch_iterable requires torch; wrap iter_row_batches(df) "
            "in a torch.utils.data.IterableDataset"
        ) from ex
    import torch

    class _DFIterable(torch.utils.data.IterableDataset):
        def __iter__(self):
            if shard_col is not None:
                return iter_shard_batches(
                    df, shard_col, num_reader_threads, batch_size
                )
            return iter_row_batches(df, batch_size)

    return _DFIterable()


def selftest_tensorflow(spark) -> list[dict]:
    """Cluster TensorFlow healthcheck (reference ``test_tensorflow``,
    ``oarphpy/spark.py:317-351``): on EVERY executor slot, import
    tensorflow, run one tiny graph computation (constant multiply,
    asserted correct — a wrong answer means a broken install, not a
    missing one), and report hostname + GPU visibility. Returns the
    per-slot info dicts; raises ``NotImplementedError`` when
    tensorflow is absent on the driver (same optional-dependency
    policy as ``to_tf_dataset``)."""
    try:
        import tensorflow  # noqa: F401
    except ImportError as ex:
        raise NotImplementedError(
            "selftest_tensorflow requires tensorflow on driver and "
            "executors"
        ) from ex

    def probe():
        import socket

        import tensorflow as tf

        x = 7
        res = int((tf.constant(x) * tf.constant(3)).numpy())
        assert res == 21, f"tf compute broken: 7*3 = {res}"
        return {
            "hostname": socket.gethostname(),
            "tf_version": tf.__version__,
            "gpus": len(tf.config.list_physical_devices("GPU")),
        }

    from oarphpy_spark.operators.cluster import for_each_executor

    return for_each_executor(spark, probe)
