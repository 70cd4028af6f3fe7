package graft.domain

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** U1: the LOCAL-model branch of the provider chain — the reference's
  * fastembed provider (`/root/reference/automem/embedding/fastembed.py:
  * 16-120`): a keyless deployment auto-selects a local model from the
  * cache directory instead of silently degrading to placeholder hash
  * embeddings. The reference conventions are kept exactly:
  *
  *  - cache dir = `AUTOMEM_MODELS_DIR` env override, else
  *    `~/.config/automem/models` (`fastembed.py:58-63`);
  *  - model auto-selected by dimension from
  *    [[ProviderInit.FastEmbedModels]] (`fastembed.py:16-20,49`);
  *  - a model counts as cached when a subdirectory name starts with the
  *    model name with `/` and `:` mapped to `--` (`fastembed.py:66-69`);
  *  - init failure (no cached model, malformed files) surfaces as "the
  *    factory yields no transport", so `auto` falls through to
  *    placeholder exactly like the reference's import/construction
  *    failure path.
  *
  * INTENTIONAL DIVERGENCE: the reference executes a BGE transformer via
  * onnxruntime; this container can add no dependencies, so the model
  * FORMAT here is a token-embedding table — `vocab.txt` (one token per
  * line) + `embeddings.f32` (row-major little-endian float32 matrix,
  * vocab_size x dimension) — executed as mean-pooled lookup with L2
  * normalization (the `normalize=True` pooling BGE models ship with).
  * That is a real local embedding model (word-vector averaging), cheap
  * enough for executors, and everything around it — selection, caching
  * conventions, batch shape, dimension validation — is the ported
  * surface. Swapping in an ONNX session behind [[EmbeddingTransport]]
  * touches nothing above this file.
  *
  * FEASIBILITY NOTE (round 8, re: closing the quality divergence with a
  * pure-JVM BGE forward pass): executing the real bge-base transformer
  * requires its weights (~430 MB of fp32 tensors) and its WordPiece
  * tokenizer table. This container has neither — a filesystem sweep finds
  * no `*.onnx` / `*.safetensors` / `tokenizer.json` anywhere, and the
  * environment has zero network egress (an HTTPS fetch of the public
  * model returns no route), so the weights cannot be obtained. A forward
  * pass without the trained weights cannot agree with reference vectors
  * at any cosine threshold; randomly-initialized layers would be quality
  * theater. The honest boundary therefore stays where it is: this
  * transport IS the local-model branch, the divergence is documented
  * here and in README, and a deployment with the model files on disk
  * plugs an ONNX-backed [[EmbeddingTransport]] into the same chain slot.
  */
class FastEmbedTransport(modelDir: String, dimension: Int)
    extends EmbeddingTransport {

  // executor-safe: the table is transient and re-read per JVM from the
  // local model dir (executors need the dir present, like any local model)
  @transient private lazy val table: (Map[String, Int], Array[Float]) =
    FastEmbedTransport.load(Paths.get(modelDir), dimension)

  override def request(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(embedOne)

  private def embedOne(text: String): Array[Float] = {
    val (vocab, matrix) = table
    val out = new Array[Float](dimension)
    var n = 0
    FastEmbedTransport.tokenize(text).foreach { tok =>
      vocab.get(tok).foreach { row =>
        val base = row * dimension
        var j = 0
        while (j < dimension) { out(j) += matrix(base + j); j += 1 }
        n += 1
      }
    }
    if (n > 0) {
      var j = 0
      while (j < dimension) { out(j) /= n; j += 1 }
      // L2 normalize (BGE-style normalized sentence embeddings)
      var norm = 0.0
      j = 0
      while (j < dimension) { norm += out(j).toDouble * out(j); j += 1 }
      if (norm > 0) {
        val inv = (1.0 / math.sqrt(norm)).toFloat
        j = 0
        while (j < dimension) { out(j) *= inv; j += 1 }
      }
    }
    // all-unknown-token texts embed to the zero vector (a model answer,
    // not a failure — mirrors an OOV-only input through mean pooling)
    out
  }
}

object FastEmbedTransport {

  /** `fastembed.py:58-63`: env override, else ~/.config/automem/models. */
  def cacheDir(env: Map[String, String]): Path =
    env.get("AUTOMEM_MODELS_DIR").filter(_.nonEmpty).map(Paths.get(_))
      .getOrElse(Paths.get(System.getProperty("user.home"),
        ".config", "automem", "models"))

  /** `fastembed.py:66-69`: directory-name convention for a cached model. */
  def modelDirName(modelName: String): String =
    modelName.replace("/", "--").replace(":", "--")

  /** Locate the cached model directory for `modelName`, requiring both
    * model files to be present (a half-written cache is "not cached").
    */
  def findModelDir(env: Map[String, String], modelName: String): Option[Path] = {
    val cache = cacheDir(env)
    if (!Files.isDirectory(cache)) return None
    val prefix = modelDirName(modelName)
    // Files.list holds a directory handle until closed (same discipline as
    // Backup.childNames / IvfIndex.childNames)
    val listing = Files.list(cache)
    try {
      listing.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(prefix))
        .find(p => Files.isRegularFile(p.resolve("vocab.txt")) &&
          Files.isRegularFile(p.resolve("embeddings.f32")))
    } finally listing.close()
  }

  /** Lowercase alphanumeric tokenization — the same normalization the
    * engine's keyword channel applies, so query and corpus agree.
    */
  def tokenize(text: String): Seq[String] =
    if (text == null) Nil
    else text.toLowerCase.split("[^\\p{L}\\p{N}]+").toSeq.filter(_.nonEmpty)

  /** Read and validate the model table; malformed files fail fast. */
  private[domain] def load(dir: Path, dimension: Int): (Map[String, Int], Array[Float]) = {
    val vocabLines = Files.readAllLines(dir.resolve("vocab.txt")).asScala.toSeq
    val vocab = vocabLines.zipWithIndex.toMap
    if (vocab.size != vocabLines.size)
      throw EmbeddingTransportException(
        s"fastembed vocab at $dir contains duplicate tokens", retryable = false)
    val bytes = Files.readAllBytes(dir.resolve("embeddings.f32"))
    val expected = vocabLines.size.toLong * dimension * 4L
    if (bytes.length != expected)
      throw EmbeddingTransportException(
        s"fastembed matrix at $dir is ${bytes.length} bytes; expected " +
          s"$expected (${vocabLines.size} tokens x ${dimension}d x 4)",
        retryable = false)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
    val matrix = new Array[Float](vocabLines.size * dimension)
    buf.get(matrix)
    (vocab, matrix)
  }

  /** Write a model in this format (spec fixtures, offline model export). */
  def writeModel(dir: Path, vocab: Seq[String],
      matrix: Seq[Array[Float]]): Unit = {
    require(vocab.size == matrix.size, "one matrix row per vocab token")
    Files.createDirectories(dir)
    Files.write(dir.resolve("vocab.txt"),
      vocab.mkString("\n").getBytes("UTF-8"))
    val dim = if (matrix.isEmpty) 0 else matrix.head.length
    val buf = ByteBuffer.allocate(vocab.size * dim * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    matrix.foreach { row =>
      require(row.length == dim, "ragged matrix")
      row.foreach(buf.putFloat)
    }
    Files.write(dir.resolve("embeddings.f32"), buf.array())
  }
}
