package graft.domain

import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** U1: real embedding-provider integration as a batched `mapPartitions`
  * stage (reference pipeline: `/root/reference/automem/embedding/
  * runtime_pipeline.py:38-125` — a worker drains a queue into batches of
  * `EMBEDDING_BATCH_SIZE` (20, `app.py:217`) and embeds each batch with one
  * provider call; providers sub-batch per API request and retry with
  * exponential backoff, `automem/embedding/voyage.py:111-243`).
  *
  * In the batch engine the queue worker becomes a per-partition loop: rows
  * stream through `Iterator.grouped(batchSize)` (memory-bounded — no
  * partition-sized buffering), each group is ONE provider call, and
  * parallelism comes from partitions instead of worker threads. The
  * network seam is [[EmbeddingTransport]], so the full batching / ordering /
  * retry / validation behavior tests offline with an injected fake.
  */
object EmbeddingStage {

  /** `app.py:217` EMBEDDING_BATCH_SIZE default. */
  val DefaultBatchSize = 20

  /** Append `outputCol` (array&lt;float&gt;) to `df` by embedding `contentCol`
    * in provider batches of `batchSize`, preserving row order within each
    * partition. Output row i of a batch corresponds to input row i
    * (`runtime_pipeline.py:108-110` zips strict).
    */
  def embed(df: DataFrame, provider: EmbeddingProvider,
      contentCol: String = "content", outputCol: String = "embedding",
      batchSize: Int = DefaultBatchSize): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val idx = df.schema.fieldIndex(contentCol)
    val outSchema = df.schema.add(outputCol, ArrayType(FloatType, containsNull = false))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { group =>
        val embeddings = provider.embedBatch(group.map(_.getString(idx)))
        require(embeddings.length == group.length,
          s"provider returned ${embeddings.length} embeddings for ${group.length} rows")
        group.lazyZip(embeddings).map { (r, e) => Row.fromSeq(r.toSeq :+ e.toSeq) }
      }
    }(Encoders.row(outSchema))
  }
}

/** The per-request network seam (one API call of <= maxRequestBatch texts).
  * Throwing [[EmbeddingTransportException]] with `retryable = true` models
  * 429/5xx responses (`voyage.py:169-183`); `retryable = false` models
  * client errors that must fail fast.
  */
trait EmbeddingTransport extends Serializable {
  def request(texts: Seq[String]): Seq[Array[Float]]
}

case class EmbeddingTransportException(message: String, retryable: Boolean)
    extends RuntimeException(message)

/** Remote-style provider over an [[EmbeddingTransport]]: sub-batches each
  * provider batch into API requests of <= `maxRequestBatch` texts
  * (`voyage.py:232-238` — 128 for Voyage), retries retryable failures up to
  * `maxRetries` times with 2^attempt-second backoff (`voyage.py:111,181-183`),
  * and validates count + dimension of every response
  * (`voyage.py:150-166`).
  *
  * `sleepFn` is injectable so specs assert the backoff schedule without
  * sleeping.
  */
class BatchedEmbeddingProvider(
    transport: EmbeddingTransport,
    val dimension: Int,
    maxRequestBatch: Int = 128,
    maxRetries: Int = 2,
    sleepFn: Long => Unit = Thread.sleep) extends EmbeddingProvider {

  override def name: String = "batched-transport"

  override def embedBatch(contents: Seq[String]): Seq[Array[Float]] =
    contents.grouped(maxRequestBatch).flatMap { chunk =>
      val out = requestWithRetry(chunk)
      if (out.length != chunk.length)
        throw new IllegalStateException(
          s"transport returned ${out.length} embeddings for ${chunk.length} texts")
      out.zipWithIndex.foreach { case (e, i) =>
        if (e.length != dimension)
          throw new IllegalStateException(
            s"embedding length ${e.length} != configured dimension $dimension at index $i")
      }
      out
    }.toSeq

  private def requestWithRetry(chunk: Seq[String]): Seq[Array[Float]] = {
    var attempt = 0
    while (true) {
      try return transport.request(chunk)
      catch {
        case e: EmbeddingTransportException if e.retryable && attempt < maxRetries =>
          sleepFn((1L << attempt) * 1000L) // 2**attempt seconds, voyage.py:182
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
