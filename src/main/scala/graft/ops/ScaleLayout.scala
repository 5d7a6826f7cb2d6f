package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tools for the 100 TB contract: bucketed co-located
  * joins (no shuffle at query time) and salted joins for skewed keys.
  */
object ScaleLayout {

  /** Persist a frame as a bucketed table: rows are hash-partitioned into
    * `buckets` files per partition by `keys` at WRITE time, so any
    * equi-join or aggregation on those keys later runs without an
    * Exchange. This is the layout decision that matters most at 100 TB —
    * the shuffle is paid once at ingest, not per query.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: String*): Unit = {
    // repartition on the SAME hash the bucketing uses, so each writer task
    // holds exactly one bucket and emits ONE file. Without this, every input
    // partition writes a file per bucket — measured 4065 files for a
    // 32-partition x 128-bucket ingest, and the per-file open cost made
    // every downstream scan ~2x slower at 100x.
    df.repartition(buckets, keys.map(df.col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Salted join for skewed keys: the skewed (large) side gets a random-but-
    * deterministic salt in [0, salts); the small side is exploded x salts.
    * The join key becomes (key, salt), splitting each hot key's rows across
    * `salts` reducers. Use when one key holds a disproportionate share of
    * rows and AQE's skew-join splitting isn't available (e.g. non-AQE
    * engines, or skew in an aggregation's shuffle).
    *
    * @param large  the skewed side (salt derived from a hash of its row)
    * @param small  the side that is exploded `salts` times
    * @param key    equi-join key column name present on both sides
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8, joinType: String = "inner"): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(salts)).cast("int"))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(explodedSmall,
        saltedLarge(key) === explodedSmall(key) &&
          saltedLarge("__salt") === explodedSmall("__salt"), joinType)
      .drop(explodedSmall(key)).drop(explodedSmall("__salt"))
      .drop("__salt")
  }

  /** Repartition-by-range + sortWithinPartitions: the write layout for
    * range-pruned scans (e.g. time-partitioned event data). Query-time
    * filters on the range column prune whole files.
    */
  def writeRangeLayout(df: DataFrame, path: String, rangeCol: String, partitions: Int): Unit = {
    df.repartitionByRange(partitions, col(rangeCol))
      .sortWithinPartitions(rangeCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Hive-style date-partitioned layout (`.../event_date=2024-01-03/...`)
    * — the standard layout for append-only event/crawl data at 100 TB. A
    * query-time filter on the partition column prunes whole DIRECTORIES at
    * planning (PartitionFilters), before any file is opened — unlike
    * row-group min/max pruning, which still lists and opens files. The
    * pre-write repartition puts each date's rows in one writer task, so a
    * day emits one file instead of one per input partition.
    */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String,
                           partitionCol: String = "event_date"): Unit = {
    df.withColumn(partitionCol, to_date(col(tsCol)))
      .repartition(col(partitionCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)
  }
}
