package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{CosineSimilarity, GraftShim}
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
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) > lit(0.0f), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
