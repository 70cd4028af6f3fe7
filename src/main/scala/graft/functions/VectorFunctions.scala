package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{AdcScore, CosineSimilarity, GraftShim, Int8CosineSimilarity}
import org.apache.spark.sql.types.DoubleType

/** Column-level vector helpers over `ARRAY<FLOAT>` embedding columns. The hot
  * path (`cosineSim`) is the native codegen'd Catalyst expression
  * [[org.apache.spark.sql.graftshim.CosineSimilarity]].
  */
object VectorFunctions {
  /** Cosine similarity between two ARRAY<FLOAT> columns (codegen'd). */
  def cosineSim(a: Column, b: Column): Column =
    GraftShim.column(CosineSimilarity(GraftShim.expression(a), GraftShim.expression(b)))

  /** Pure-builtin fallback (higher-order functions); used to cross-check the
    * native expression in tests.
    */
  def cosineSimBuiltin(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast(DoubleType))
    val bd = transform(b, x => x.cast(DoubleType))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val nx = aggregate(ad, lit(0.0), (acc, x) => acc + x * x)
    val ny = aggregate(bd, lit(0.0), (acc, x) => acc + x * x)
    when(nx === 0.0 || ny === 0.0, lit(0.0)).otherwise(dot / (sqrt(nx) * sqrt(ny)))
  }

  /** SimHash-style sign bucket over the first `bits` dimensions: bit i set iff
    * element i > 0. Cheap deterministic LSH blocking key for near-dup /
    * ANN bucketing (scale path: bucket-join instead of O(n^2) cross join).
    */
  def signBucket(v: Column, bits: Int): Column = signBucketAt(v, bits, 0)

  /** Sign bucket over dimensions [offset, offset + bits): the band-OR
    * building block — several offset bucketings unioned raise the recall of
    * a blocked similarity join the way LSH bands do (a pair only needs to
    * agree in ONE band to become a candidate).
    */
  def signBucketAt(v: Column, bits: Int, offset: Int): Column =
    (0 until bits).map { i =>
      // get() is 0-based and returns null past the end — under ANSI mode
      // (this Spark's default) element_at would ABORT the job on one
      // short/malformed vector instead of bucketing it; null > 0 is false,
      // which matches the DuckDB mirrors (out-of-range list index -> NULL
      // -> CASE falls to 0), so short vectors zero-fill their missing bits
      // identically in both engines
      when(get(v, lit(offset + i)) > lit(0.0f), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Scalar int8 quantization of an embedding: per-vector min/max affine
    * mapping to [-127, 127] stored as (scale, offset, tinyint array) — 4x
    * smaller vector storage/shuffle at 100 TB; candidate scoring runs on
    * the quantized form, exact re-scoring only on the top-k.
    */
  def quantizeInt8(v: Column): Column = {
    val mn = array_min(v).cast("double")
    val mx = array_max(v).cast("double")
    val scale = when(mx === mn, lit(1.0)).otherwise((mx - mn) / 254.0)
    struct(
      scale.as("scale"),
      mn.as("offset"),
      transform(v, x =>
        round((x.cast("double") - mn) / scale - 127.0).cast("byte")).as("q"))
  }

  /** Reconstruct an approximate float vector from the quantized form. */
  def dequantizeInt8(qv: Column): Column =
    transform(qv.getField("q"), b =>
      ((b.cast("double") + 127.0) * qv.getField("scale") + qv.getField("offset"))
        .cast("float"))

  /** PQ asymmetric-distance score: Σ_j lut(j)(code(j)) over an ARRAY<INT>
    * code column and an ARRAY<ARRAY<DOUBLE>> per-query lookup table
    * (codegen'd — m array lookups + adds per row, no per-row HOF
    * machinery). Bitwise-equal to the interpreted
    * `aggregate(zip_with(code, lut, element_at), 0.0, +)` form it
    * replaces (same j-ascending fold order).
    */
  def adcScore(code: Column, lut: Column): Column =
    GraftShim.column(AdcScore(
      GraftShim.expression(code), GraftShim.expression(lut)))

  /** [[adcScore]] with the table selected from a LITERAL per-query LUT
    * table by a per-row 4-byte index — the batch-channel form: the row
    * carries `idx`, never the ~2 KB table (see AdcScoreAt's scaladoc for
    * the measured row-width cost this avoids).
    */
  def adcScoreAt(code: Column, idx: Column, luts: Column): Column =
    GraftShim.column(org.apache.spark.sql.graftshim.AdcScoreAt(
      GraftShim.expression(code), GraftShim.expression(idx),
      GraftShim.expression(luts)))

  /** Cosine similarity between a PACKED int8 vector (binary bytes +
    * per-vector scale/offset, the [[quantizeInt8]] struct flattened for
    * storage) and a float query — codegen'd, dequantizes inside the loop.
    */
  def int8CosineSim(bytes: Column, scale: Column, offset: Column,
      query: Column): Column =
    GraftShim.column(Int8CosineSimilarity(
      GraftShim.expression(bytes), GraftShim.expression(scale),
      GraftShim.expression(offset), GraftShim.expression(query)))
}
