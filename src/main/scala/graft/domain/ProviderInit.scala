package graft.domain

/** U1: the embedding provider-selection chain, ported from the reference's
  * env-gated ordered auto-selection (`automem/embedding/provider_init.py:
  * 59-278`) and effective-dimension resolution (`automem/utils/validation.py:
  * 37-100`, `provider_init.py:120-160`).
  *
  * Selection semantics (reference priority order):
  *   - `EMBEDDING_PROVIDER=auto` (default): voyage (if `VOYAGE_API_KEY`) ->
  *     openai (if `OPENAI_API_KEY`) -> ollama (if `OLLAMA_BASE_URL` or
  *     `OLLAMA_MODEL`) -> fastembed (local, no key) -> placeholder. A
  *     failing candidate logs and falls through.
  *   - explicit `voyage|openai|local|ollama|placeholder`: that provider or
  *     an error — no fallback.
  *
  * The network/model-load seam is [[ProviderInit.TransportFactory]]: the
  * reference's "can this provider initialize" (SDK import + client
  * construction) becomes "does the factory yield a transport". Everything
  * above that seam — env gating, dimension adoption/validation, model
  * resolution, per-provider batch/retry shape, provider naming — is the
  * ported logic, testable offline with fake transports.
  */
object ProviderInit {

  /** `provider_init.py:127`: text-embedding-3-small's native maximum. */
  val SmallModelMaxDim = 1536

  /** `provider_init.py:131-133`: voyage models only produce these sizes. */
  val VoyageDims: Set[Int] = Set(256, 512, 1024, 2048)

  /** `fastembed.py:16-20`: dimension -> local model; unknown dims fall back
    * to the base model (`fastembed.py:49`).
    */
  val FastEmbedModels: Map[Int, String] = Map(
    384 -> "BAAI/bge-small-en-v1.5",
    768 -> "BAAI/bge-base-en-v1.5",
    1024 -> "BAAI/bge-large-en-v1.5")

  /** `config.py:15`: VECTOR_SIZE default. */
  val DefaultVectorSize = 1024

  /** Voyage sub-batches API requests to 128 texts (`voyage.py:232-238`);
    * OpenAI accepts up to 2048 inputs per request; Ollama's API embeds one
    * text per call (`ollama.py:44-80` loops); fastembed is a local model
    * call, one invocation per provider batch.
    */
  val RequestBatch: Map[String, Int] =
    Map("voyage" -> 128, "openai" -> 2048, "ollama" -> 1, "fastembed" -> 20)

  case class SelectionError(message: String) extends RuntimeException(message)

  /** Availability seam: `None` models the reference's init failure (SDK
    * missing, client construction raised) for that provider.
    */
  trait TransportFactory extends Serializable {
    def forProvider(name: String): Option[EmbeddingTransport]
  }

  case class Selected(provider: EmbeddingProvider, kind: String,
      autoSelected: Boolean, warnings: Seq[String])

  /** Effective embedding dimension (`validation.py:57-96` + `provider_init
    * .py:151-155`): an existing collection's dimension wins over config
    * unless `VECTOR_SIZE_AUTODETECT` is off, in which case a mismatch is a
    * hard error. Returns (dimension, source).
    */
  def effectiveVectorSize(env: Map[String, String],
      collectionDim: Option[Int]): (Int, String) = {
    val config = env.get("VECTOR_SIZE").filter(_.nonEmpty)
      .orElse(env.get("QDRANT_VECTOR_SIZE").filter(_.nonEmpty))
      .map(_.toInt).getOrElse(DefaultVectorSize)
    collectionDim match {
      case None => (config, "config")
      case Some(cd) if cd == config => (cd, "collection")
      case Some(cd) =>
        val deny = env.get("VECTOR_SIZE_AUTODETECT")
          .exists(v => Set("0", "false", "no", "off").contains(v.toLowerCase))
        if (deny) throw SelectionError(
          s"vector dimension mismatch: collection=${cd}d, config=${config}d " +
            "and VECTOR_SIZE_AUTODETECT is disabled")
        (cd, "collection")
    }
  }

  /** `provider_init.py:163-177`: auto-upgrade small -> large when the target
    * dimension exceeds the small model's native size.
    */
  def resolveOpenAiModel(model: String, vectorSize: Int): String = {
    val small = "text-embedding-3-small"
    if (vectorSize > SmallModelMaxDim && model.endsWith(small))
      model.dropRight(small.length) + "text-embedding-3-large"
    else model
  }

  /** `provider_init.py:136-160`: fail early when the adopted dimension is
    * one the provider cannot produce.
    */
  def validateProviderDimension(provider: String, vectorSize: Int): Unit =
    if (provider == "voyage" && !VoyageDims.contains(vectorSize))
      throw SelectionError(
        s"dimension mismatch: collection dimension ${vectorSize}d is not " +
          s"producible by voyage (supported: ${VoyageDims.toSeq.sorted.mkString(", ")})")

  /** `openai.py:166-180`: a non-native base URL flips the provider name to
    * openai-compatible.
    */
  private def isOpenAiNative(baseUrl: String): Boolean =
    baseUrl.isEmpty || baseUrl.contains("api.openai.com")

  /** The selection chain (`provider_init.py:178-278`). `collectionDim` is
    * the existing store's dimension (the Qdrant collection lookup in the
    * reference), `None` for a fresh store.
    */
  def select(env: Map[String, String], transports: TransportFactory,
      collectionDim: Option[Int] = None,
      embeddingModel: String = "text-embedding-3-small"): Selected = {
    val providerConfig =
      env.get("EMBEDDING_PROVIDER").map(_.trim.toLowerCase).filter(_.nonEmpty)
        .getOrElse("auto")
    val (vectorSize, _) = effectiveVectorSize(env, collectionDim)
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]

    def batched(kind: String, providerName: String,
        maxRetries: Int = 2): EmbeddingProvider = {
      val transport = transports.forProvider(kind).getOrElse(
        throw SelectionError(s"Failed to initialize $kind provider"))
      new BatchedEmbeddingProvider(transport, vectorSize,
        maxRequestBatch = RequestBatch(kind), maxRetries = maxRetries) {
        override def name: String = providerName
      }
    }

    def voyage(): EmbeddingProvider = {
      validateProviderDimension("voyage", vectorSize)
      val model = env.getOrElse("VOYAGE_MODEL", "voyage-4")
      batched("voyage", s"voyage:$model")
    }
    def openai(): EmbeddingProvider = {
      val baseUrl = env.getOrElse("OPENAI_BASE_URL", "").trim
      val model = resolveOpenAiModel(embeddingModel, vectorSize)
      val name =
        if (isOpenAiNative(baseUrl)) s"openai:$model"
        else s"openai-compatible:$model"
      batched("openai", name)
    }
    def fastembed(): EmbeddingProvider = {
      val model = FastEmbedModels.getOrElse(vectorSize, "BAAI/bge-base-en-v1.5")
      batched("fastembed", s"fastembed:$model")
    }
    def ollama(strict: Boolean): EmbeddingProvider = {
      val model = env.getOrElse("OLLAMA_MODEL", "nomic-embed-text")
      val retries =
        try env.getOrElse("OLLAMA_MAX_RETRIES", "2").toInt
        catch {
          case _: NumberFormatException if strict =>
            throw SelectionError("Invalid OLLAMA_TIMEOUT or OLLAMA_MAX_RETRIES value")
          case _: NumberFormatException =>
            warnings += "Invalid OLLAMA_TIMEOUT or OLLAMA_MAX_RETRIES, using defaults"
            2
        }
      // OLLAMA_TIMEOUT parses under the same strictness contract
      try env.getOrElse("OLLAMA_TIMEOUT", "30").toDouble
      catch {
        case _: NumberFormatException if strict =>
          throw SelectionError("Invalid OLLAMA_TIMEOUT or OLLAMA_MAX_RETRIES value")
        case _: NumberFormatException => ()
      }
      batched("ollama", s"ollama:$model", maxRetries = retries)
    }
    def placeholder(): EmbeddingProvider = new PlaceholderProvider(vectorSize) {
      override def name: String = "placeholder"
    }

    providerConfig match {
      case "voyage" =>
        if (!env.get("VOYAGE_API_KEY").exists(_.nonEmpty))
          throw SelectionError("EMBEDDING_PROVIDER=voyage but VOYAGE_API_KEY not set")
        Selected(voyage(), "voyage", autoSelected = false, warnings.toSeq)
      case "openai" =>
        if (!env.get("OPENAI_API_KEY").exists(_.nonEmpty))
          throw SelectionError("EMBEDDING_PROVIDER=openai but OPENAI_API_KEY not set")
        Selected(openai(), "openai", autoSelected = false, warnings.toSeq)
      case "local" =>
        Selected(fastembed(), "fastembed", autoSelected = false, warnings.toSeq)
      case "ollama" =>
        Selected(ollama(strict = true), "ollama", autoSelected = false, warnings.toSeq)
      case "placeholder" =>
        Selected(placeholder(), "placeholder", autoSelected = false, warnings.toSeq)
      case "auto" =>
        def tryChain(kind: String, next: String,
            build: () => EmbeddingProvider): Option[EmbeddingProvider] =
          try Some(build())
          catch {
            case e: SelectionError =>
              warnings += s"Failed to initialize $kind provider, trying $next: ${e.message}"
              None
          }
        val chosen =
          env.get("VOYAGE_API_KEY").filter(_.nonEmpty)
            .flatMap(_ => tryChain("voyage", "openai", () => voyage()))
            .map(p => Selected(p, "voyage", autoSelected = true, warnings.toSeq))
          .orElse(env.get("OPENAI_API_KEY").filter(_.nonEmpty)
            .flatMap(_ => tryChain("openai", "ollama", () => openai()))
            .map(p => Selected(p, "openai", autoSelected = true, warnings.toSeq)))
          .orElse(
            if (env.get("OLLAMA_BASE_URL").exists(_.nonEmpty) ||
                env.get("OLLAMA_MODEL").exists(_.nonEmpty))
              tryChain("ollama", "local", () => ollama(strict = false))
                .map(p => Selected(p, "ollama", autoSelected = true, warnings.toSeq))
            else None)
          .orElse(tryChain("fastembed", "placeholder", () => fastembed())
            .map(p => Selected(p, "fastembed", autoSelected = true, warnings.toSeq)))
        chosen.getOrElse {
          warnings += "Using placeholder embeddings (no semantic search)"
          Selected(placeholder(), "placeholder", autoSelected = true, warnings.toSeq)
        }
      case other =>
        throw SelectionError(
          s"Invalid EMBEDDING_PROVIDER=$other. Valid options: auto, voyage, " +
            "openai, local, ollama, placeholder")
    }
  }
}
