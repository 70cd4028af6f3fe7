package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md) and for any
  * parquet-backed graft table. One parquet file per table; at cluster scale
  * these would be date-partitioned directories — the reader call is the same.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** events.parquet has shipped with two layouts across testdata
    * regenerations: TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * accepts as a raw long via `nanosAsLong`) and plain timestamp[us]
    * (read as TIMESTAMP_NTZ or TIMESTAMP depending on writer metadata).
    * Adapt to whatever the file actually contains so `ts` always comes out
    * as a session-zone TimestampType truncated to microseconds — the same
    * resolution DuckDB uses, so oracle comparisons stay exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) surfaced as long nanos
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
      case TimestampType => raw
      case _ => // TIMESTAMP_NTZ (timestamp[us] with no zone metadata)
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")

  /** embeddings.parquet: pin the vector element type to FLOAT on load. A
    * regenerated file that writes list&lt;double&gt; (the pyarrow default when a
    * generator stops down-casting) would otherwise ClassCastException every
    * `getSeq[Float]` consumer — query-vector lookup, IVF build/append —
    * and silently change cosine hashes. Same drift class as the events
    * timestamp layout (r8): adapt at the loader, not at every call site.
    */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val raw = table(spark, dir, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case _: ArrayType => raw.withColumn("embedding",
        org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
      case _ => raw
    }
  }
}
