package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-iteration Lloyd's k-means: hand-computable fixture semantics,
  * deterministic tie-breaks, empty-cluster carry-over, and the no-join
  * assignment plan shape.
  */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def df(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.map { case (id, e) => (id, e.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
  }

  test("two well-separated blobs: members assigned to their blob's mean") {
    // blob A around (0,0), blob B around (10,10); init = two lowest ids,
    // one in each blob — Lloyd's must settle each point on its own blob
    val vecs = df(Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 10.0)),
      (2L, Seq(0.2, 0.0)), (3L, Seq(0.0, 0.2)),
      (4L, Seq(10.2, 10.0)), (5L, Seq(10.0, 10.2))))
    val out = KMeans.fit(vecs, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 0 && out(2L) == 0 && out(3L) == 0, s"got $out")
    assert(out(1L) == 1 && out(4L) == 1 && out(5L) == 1, s"got $out")
    // after one update the centroid of blob A is its mean (0.0667, 0.0667)
    // rounded to 6dp — distances reported against the FINAL centroids
    val cents = KMeans.fitCentroids(vecs, k = 2, iters = 1)
    assert(cents(0).map(x => math.rint(x * 1e4) / 1e4) == Seq(0.0667, 0.0667),
      s"got ${cents(0)}")
    assert(cents(1).map(x => math.rint(x * 1e4) / 1e4) ==
      Seq(10.0667, 10.0667), s"got ${cents(1)}")
  }

  test("equidistant point ties to the LOWER cluster index on both engines") {
    val vecs = df(Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(2.0, 0.0)),
      (2L, Seq(1.0, 0.0)))) // exactly between the two init centroids
    val out = KMeans.assign(vecs,
        Seq(Seq(0.0, 0.0), Seq(2.0, 0.0)))
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(2L) == 0, s"tie must break low: $out")
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // init picks ids 0 and 1 as centroids, but every point is closest to
    // centroid 0 after the first update — cluster 1 goes empty and must
    // carry its previous centroid instead of NaN-ing out
    val vecs = df(Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.4, 0.0)),
      (2L, Seq(0.1, 0.0)), (3L, Seq(0.05, 0.0))))
    val cents = KMeans.fitCentroids(vecs, k = 2, iters = 3)
    assert(cents.size == 2)
    assert(!cents.exists(_.exists(_.isNaN)), s"NaN centroid: $cents")
    val out = KMeans.fit(vecs, k = 2, iters = 3)
    assert(out.count() == 4)
  }

  test("assignment plan is a single projection — no join, no shuffle") {
    val vecs = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val cents = KMeans.fitCentroids(vecs, k = 4, iters = 1)
    val plan = KMeans.assign(vecs, cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
  }

  test("deterministic across parallelism") {
    val vecs = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val a = KMeans.fit(vecs, k = 8, iters = 2).collect().map(_.toSeq).toSeq
    val b = KMeans.fit(vecs.repartition(7), k = 8, iters = 2)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(a == b, "k-means must not depend on partitioning")
  }
}
