package graft

import graft.domain._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Offline tests of the batched embedding pipeline against an injected fake
  * transport: batch grouping (20 per provider call, `app.py:217`),
  * per-request sub-batching (128, `voyage.py:233`), strict input->output
  * ordering (`runtime_pipeline.py:108-110`), retry with exponential backoff
  * on retryable failures and fail-fast otherwise (`voyage.py:111-193`), and
  * response validation.
  */
class EmbeddingStageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Deterministic fake: embedding of text t = [len(t), firstCharCode]. */
  private def fakeVec(t: String): Array[Float] =
    Array(t.length.toFloat, if (t.isEmpty) 0f else t.head.toFloat)

  test("spark stage embeds in provider batches of batchSize, preserving order") {
    import spark.implicits._
    FakeTransportRecorder.reset()
    val provider = new BatchedEmbeddingProvider(new RecordingFakeTransport, dimension = 2)
    val df = (0 until 45).map(i => (s"m$i", "x" * (i + 1))).toDF("id", "content")
      .repartition(1) // one partition -> deterministic grouping 20/20/5
    val out = EmbeddingStage.embed(df, provider).collect()
    assert(out.length == 45)
    out.foreach { r =>
      val content = r.getAs[String]("content")
      val emb = r.getSeq[Float](r.fieldIndex("embedding"))
      assert(emb == fakeVec(content).toSeq,
        s"row ${r.getAs[String]("id")}: embedding must match ITS OWN content")
    }
    assert(FakeTransportRecorder.sizes() == Seq(20, 20, 5),
      s"expected batches 20/20/5, got ${FakeTransportRecorder.sizes()}")
  }

  test("provider sub-batches one oversized provider batch into transport requests") {
    FakeTransportRecorder.reset()
    val transport = new EmbeddingTransport {
      override def request(texts: Seq[String]): Seq[Array[Float]] = {
        FakeTransportRecorder.record(texts.length)
        texts.map(fakeVec)
      }
    }
    val provider = new BatchedEmbeddingProvider(transport, dimension = 2,
      maxRequestBatch = 128)
    val contents = (0 until 300).map(i => s"t$i")
    val out = provider.embedBatch(contents)
    assert(out.length == 300)
    assert(FakeTransportRecorder.sizes() == Seq(128, 128, 44))
    assert(out(299).toSeq == fakeVec("t299").toSeq)
  }

  test("retryable failures back off 2^attempt seconds then succeed") {
    val sleeps = mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val flaky = new EmbeddingTransport {
      override def request(texts: Seq[String]): Seq[Array[Float]] = {
        calls += 1
        if (calls <= 2) throw EmbeddingTransportException("rate limited", retryable = true)
        texts.map(fakeVec)
      }
    }
    val provider = new BatchedEmbeddingProvider(flaky, dimension = 2,
      maxRetries = 2, sleepFn = sleeps += _)
    val out = provider.embedBatch(Seq("abc", "de"))
    assert(out.length == 2 && calls == 3)
    assert(sleeps.toSeq == Seq(1000L, 2000L), s"backoff schedule: $sleeps")
  }

  test("retryable failure beyond maxRetries and non-retryable failure propagate") {
    val alwaysDown = new EmbeddingTransport {
      override def request(texts: Seq[String]): Seq[Array[Float]] =
        throw EmbeddingTransportException("server error", retryable = true)
    }
    val exhausted = new BatchedEmbeddingProvider(alwaysDown, dimension = 2,
      maxRetries = 2, sleepFn = _ => ())
    val e1 = intercept[EmbeddingTransportException](exhausted.embedBatch(Seq("x")))
    assert(e1.retryable)

    var calls = 0
    val clientError = new EmbeddingTransport {
      override def request(texts: Seq[String]): Seq[Array[Float]] = {
        calls += 1
        throw EmbeddingTransportException("bad request", retryable = false)
      }
    }
    val failFast = new BatchedEmbeddingProvider(clientError, dimension = 2,
      sleepFn = _ => ())
    intercept[EmbeddingTransportException](failFast.embedBatch(Seq("x")))
    assert(calls == 1, "non-retryable errors must not be retried")
  }

  test("count and dimension validation reject malformed responses") {
    val wrongCount = new EmbeddingTransport {
      override def request(texts: Seq[String]): Seq[Array[Float]] =
        texts.drop(1).map(fakeVec)
    }
    intercept[IllegalStateException](
      new BatchedEmbeddingProvider(wrongCount, dimension = 2)
        .embedBatch(Seq("a", "b")))
    val wrongDim = new EmbeddingTransport {
      override def request(texts: Seq[String]): Seq[Array[Float]] =
        texts.map(_ => Array(1f, 2f, 3f))
    }
    intercept[IllegalStateException](
      new BatchedEmbeddingProvider(wrongDim, dimension = 2).embedBatch(Seq("a")))
  }

  test("placeholder provider plugs into the same spark stage") {
    import spark.implicits._
    val df = Seq(("a", "hello world"), ("b", "hello world"), ("c", "other"))
      .toDF("id", "content")
    val out = EmbeddingStage.embed(df, new PlaceholderProvider(), batchSize = 2)
      .collect().map(r => r.getAs[String]("id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))).toMap
    assert(out("a") == out("b"), "identical content -> identical embedding")
    assert(out("a") != out("c"))
    assert(out("a").length == PlaceholderEmbedding.DefaultDim)
  }
}

/** Top-level (serializable, no outer spec reference) recording fake:
  * embedding of text t = [len(t), firstCharCode].
  */
class RecordingFakeTransport extends EmbeddingTransport {
  override def request(texts: Seq[String]): Seq[Array[Float]] = {
    FakeTransportRecorder.record(texts.length)
    texts.map(t => Array(t.length.toFloat, if (t.isEmpty) 0f else t.head.toFloat))
  }
}

/** Static recorder: survives closure serialization in local mode. */
object FakeTransportRecorder {
  private val batches = mutable.ArrayBuffer.empty[Int]
  def reset(): Unit = synchronized(batches.clear())
  def record(n: Int): Unit = synchronized(batches += n)
  def sizes(): Seq[Int] = synchronized(batches.toSeq)
}
