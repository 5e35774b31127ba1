"""Generational parquet state with an atomic CURRENT-pointer commit.

Shared by every foreachBatch handler that maintains persisted state
(reach sketches, CDC dimension upserts): each batch writes a fresh
``gen-<batch_id>`` subdirectory, then flips the ``CURRENT`` pointer file
as the commit point. An in-place parquet overwrite has a torn-state
window (old files deleted, new commit not yet written) that an
existence probe would mistake for valid state — silently truncating
accumulated history. With the pointer protocol every crash lands in a
recoverable spot:

- crash before the pointer flip → pointer still names the previous
  generation; the replayed batch re-derives the new generation
  (parquet overwrite of an uncommitted dir) and flips again;
- crash inside the flip (tmp written, CURRENT not yet renamed) → the
  fully-written ``CURRENT.tmp`` is promoted on the next read;
- generation dirs without any pointer → ambiguous, FAIL LOUDLY (never
  guess "no state yet" when state files exist).

Uses the Hadoop FS API throughout, so the same code runs on
file:/hdfs:/s3a: paths. Crash cases are exercised in
tests/test_events_stream.py::test_reach_sketch_state_commit_protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class GenerationalState:
    POINTER = "CURRENT"

    def __init__(self, state_dir: str) -> None:
        self.state_dir = state_dir

    # --- pointer protocol -------------------------------------------------

    def _fs(self, spark: SparkSession):
        jvm = spark._jvm
        root = jvm.org.apache.hadoop.fs.Path(self.state_dir)
        return jvm, root.getFileSystem(spark._jsc.hadoopConfiguration())

    def _path(self, spark: SparkSession, *parts: str):
        return spark._jvm.org.apache.hadoop.fs.Path(
            "/".join([self.state_dir.rstrip("/"), *parts])
        )

    def _read_small_file(self, spark: SparkSession, path) -> str:
        _, fs = self._fs(spark)
        stream = fs.open(path)
        try:
            data = bytearray()
            b = stream.read()
            while b != -1:  # pointer payload is ~16 bytes
                data.append(b)
                b = stream.read()
        finally:
            stream.close()
        return data.decode("utf-8").strip()

    def current_generation(self, spark: SparkSession) -> str | None:
        """Resolve the committed generation dir name, promoting a
        fully-written-but-unrenamed pointer if the last flip was torn.
        Returns None only when NO state artifacts exist at all."""
        jvm, fs = self._fs(spark)
        ptr = self._path(spark, self.POINTER)
        tmp = self._path(spark, self.POINTER + ".tmp")
        if fs.exists(ptr):
            return self._read_small_file(spark, ptr)
        if fs.exists(tmp):
            # crash between delete(CURRENT) and rename(tmp): the tmp was
            # fully written+closed before the old pointer was touched
            fs.rename(tmp, ptr)
            return self._read_small_file(spark, ptr)
        root = self._path(spark)
        if fs.exists(root) and [
            s
            for s in fs.listStatus(root)
            if s.getPath().getName().startswith("gen-")
        ]:
            raise RuntimeError(
                f"state dir {self.state_dir} contains generation dirs "
                "but no CURRENT pointer — refusing to treat existing "
                "state as 'first batch' (that would silently reset "
                "accumulated state); repair or remove the dir"
            )
        return None

    def _flip_pointer(self, spark: SparkSession, gen_name: str) -> None:
        jvm, fs = self._fs(spark)
        ptr = self._path(spark, self.POINTER)
        tmp = self._path(spark, self.POINTER + ".tmp")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(gen_name.encode("utf-8")))
        finally:
            out.close()
        if fs.exists(ptr):
            fs.delete(ptr, False)
        fs.rename(tmp, ptr)

    def _gc_generations(self, spark: SparkSession, keep: str) -> None:
        jvm, fs = self._fs(spark)
        root = self._path(spark)
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("gen-") and name != keep:
                fs.delete(st.getPath(), True)

    # --- read / commit ----------------------------------------------------

    def read_current(self, spark: SparkSession) -> DataFrame | None:
        gen = self.current_generation(spark)
        if gen is None:
            return None
        return spark.read.parquet(f"{self.state_dir}/{gen}")

    def commit(
        self, spark: SparkSession, df: DataFrame, batch_id: int
    ) -> None:
        """Write ``df`` as generation ``batch_id`` and flip the pointer.
        The caller must have localCheckpoint-ed any lineage that reads
        the directory being replaced."""
        gen_name = f"gen-{batch_id:010d}"
        df.write.mode("overwrite").parquet(f"{self.state_dir}/{gen_name}")
        self._flip_pointer(spark, gen_name)  # ← the commit point
        self._gc_generations(spark, keep=gen_name)
