package graft

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class CoreFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("cosine expression matches builtin HOF implementation") {
    import spark.implicits._
    val df = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding"))
    val q = Similarity.queryVec(df)
    val both = df.select(
      VectorFunctions.cosineSim(col("embedding"), q).as("native"),
      VectorFunctions.cosineSimBuiltin(col("embedding"), q).as("builtin"))
    val rows = both.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"native=${r.getDouble(0)} builtin=${r.getDouble(1)}")
    }
  }

  test("cosine of a vector with itself is 1") {
    val df = Tables.embeddings(spark, sf).limit(10)
    val sims = df.select(VectorFunctions.cosineSim(col("embedding"), col("embedding")))
      .collect().map(_.getDouble(0))
    sims.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("tag prefix expansion matches reference semantics") {
    import spark.implicits._
    val df = Seq(Seq("Project:Foo:Bar", "simple")).toDF("tags")
    val got = df.select(TextFunctions.tagPrefixes(col("tags"))).head().getSeq[String](0)
    assert(got.toSet == Set("project", "project:foo", "project:foo:bar", "simple"))
  }

  test("word shingles: distinct 3-grams, short text -> empty") {
    import spark.implicits._
    val df = Seq("a b c d", "x y").toDF("text")
    val got = df.select(TextFunctions.wordShingles(col("text"), 3)).collect()
    assert(got(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(got(1).getSeq[String](0).isEmpty)
  }

  test("langId picks the language with most distinct marker hits") {
    import spark.implicits._
    val df = Seq("the cat and the dog is big", "el la de que cosa",
      "nothing matching here").toDF("text")
    val got = df.select(TextFunctions.langId(col("text"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "es", "unknown"))
  }

  test("quality score is within [0,1]") {
    val qs = Tables.documents(spark, sf)
      .select(TextFunctions.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).head()
    assert(qs.getDouble(0) >= 0.0 && qs.getDouble(1) <= 1.0)
  }

  test("all registered queries execute and entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("cosine_similarity is callable from SQL after registration") {
    org.apache.spark.sql.graftshim.GraftSqlFunctions.register(spark)
    val one = spark.sql(
      "SELECT cosine_similarity(array(1.0f, 0.0f), array(2.0f, 0.0f)) AS s")
      .head().getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
    val orth = spark.sql(
      "SELECT cosine_similarity(array(1.0f, 0.0f), array(0.0f, 3.0f)) AS s")
      .head().getDouble(0)
    assert(orth == 0.0)
  }

  test("int8 quantization: 4x smaller, cosine error under 1e-2") {
    val df = Tables.embeddings(spark, sf).limit(100)
    val q = df.select(col("vec_id"), col("embedding"),
      VectorFunctions.quantizeInt8(col("embedding")).as("qv"))
    val recon = q.select(col("vec_id"),
      VectorFunctions.cosineSim(col("embedding"),
        VectorFunctions.dequantizeInt8(col("qv"))).as("self_sim"))
    val sims = recon.collect().map(_.getDouble(1))
    assert(sims.length == 100)
    sims.foreach(s => assert(s > 0.99, s"reconstruction cosine $s too low"))
  }
}

object Similarity {
  /** First embedding as literal query vector for the spec. */
  def queryVec(df: org.apache.spark.sql.DataFrame) =
    typedlit(df.orderBy("vec_id").head().getSeq[Float](1).toArray)
}
