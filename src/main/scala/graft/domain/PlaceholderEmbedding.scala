package graft.domain

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Deterministic content-hash embeddings, the offline stand-in for real
  * providers (reference placeholder provider:
  * `/root/reference/automem/embedding/placeholder.py:27-42` — sha256(content)
  * seeds a PRNG that emits the vector). Same contract here: identical content
  * -> identical vector, no network, unit norm. Real providers plug in behind
  * [[EmbeddingProvider]] as a `mapPartitions` batch stage.
  */
object PlaceholderEmbedding {
  val DefaultDim = 64

  /** sha256(content) -> splitmix64 stream -> gaussian-ish floats, L2-normalized. */
  def embed(content: String, dim: Int = DefaultDim): Array[Float] = {
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(Option(content).getOrElse("").getBytes(StandardCharsets.UTF_8))
    var state = java.nio.ByteBuffer.wrap(digest, 0, 8).getLong
    def next(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val v = Array.ofDim[Float](dim)
    var i = 0
    while (i < dim) {
      // uniform in [-1, 1)
      v(i) = ((next() >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      i += 1
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    if (norm > 0) v.map(x => (x / norm).toFloat) else v
  }

  /** Column form (UDF is fine here: this is the offline test provider, not
    * the hot query path; real embedding is an external batch call anyway).
    */
  def embedColumn(dim: Int = DefaultDim): Column => Column = {
    val f = udf((s: String) => embed(s, dim))
    c => f(c)
  }
}

/** Pluggable embedding provider trait (reference
  * `automem/embedding/provider.py:1-60`): batch-first, fixed dimension.
  */
trait EmbeddingProvider extends Serializable {
  def name: String
  def dimension: Int
  def embedBatch(contents: Seq[String]): Seq[Array[Float]]
}

/** The deterministic default provider. */
class PlaceholderProvider(val dimension: Int = PlaceholderEmbedding.DefaultDim)
    extends EmbeddingProvider {
  override def name: String = "placeholder-hash"
  override def embedBatch(contents: Seq[String]): Seq[Array[Float]] =
    contents.map(PlaceholderEmbedding.embed(_, dimension))
}
