package graft

import graft.domain._
import graft.domain.ProviderInit.{SelectionError, TransportFactory}
import org.scalatest.funsuite.AnyFunSuite

/** Selection-matrix tests for the provider chain (`provider_init.py:59-278`)
  * with fake transports per branch — no network. Covers explicit selection,
  * auto-selection fallthrough order, dimension adoption
  * (`validation.py:37-100`) incl. strict mode, voyage dimension constraints,
  * and the small->large OpenAI model upgrade.
  */
class ProviderInitSpec extends AnyFunSuite {

  /** Factory where only `available` kinds yield a transport; each transport
    * returns [dimension]-sized constant vectors so embedBatch round-trips.
    */
  private def factory(dim: Int, available: String*): TransportFactory =
    new TransportFactory {
      def forProvider(name: String): Option[EmbeddingTransport] =
        if (available.contains(name))
          Some(new EmbeddingTransport {
            def request(texts: Seq[String]): Seq[Array[Float]] =
              texts.map(_ => Array.fill(dim)(0.5f))
          })
        else None
    }

  private val allKinds = Seq("voyage", "openai", "ollama", "fastembed")

  test("explicit voyage without VOYAGE_API_KEY is a hard error") {
    val e = intercept[SelectionError] {
      ProviderInit.select(Map("EMBEDDING_PROVIDER" -> "voyage"), factory(1024, allKinds: _*))
    }
    assert(e.message.contains("VOYAGE_API_KEY not set"))
  }

  test("explicit voyage selects voyage:<model> and embeds at the effective dim") {
    val sel = ProviderInit.select(
      Map("EMBEDDING_PROVIDER" -> "voyage", "VOYAGE_API_KEY" -> "k",
        "VOYAGE_MODEL" -> "voyage-3-lite", "VECTOR_SIZE" -> "512"),
      factory(512, "voyage"))
    assert(sel.provider.name == "voyage:voyage-3-lite")
    assert(!sel.autoSelected)
    val out = sel.provider.embedBatch(Seq("a", "b"))
    assert(out.length == 2 && out.forall(_.length == 512))
  }

  test("voyage rejects dimensions it cannot produce (provider_init.py:136-160)") {
    val e = intercept[SelectionError] {
      ProviderInit.select(
        Map("EMBEDDING_PROVIDER" -> "voyage", "VOYAGE_API_KEY" -> "k"),
        factory(768, "voyage"), collectionDim = Some(768))
    }
    assert(e.message.contains("768") && e.message.contains("256, 512, 1024, 2048"))
  }

  test("explicit openai without key errors; with key names openai:<model>") {
    intercept[SelectionError] {
      ProviderInit.select(Map("EMBEDDING_PROVIDER" -> "openai"), factory(1024, allKinds: _*))
    }
    val sel = ProviderInit.select(
      Map("EMBEDDING_PROVIDER" -> "openai", "OPENAI_API_KEY" -> "k"),
      factory(1024, "openai"))
    assert(sel.provider.name == "openai:text-embedding-3-small")
  }

  test("openai auto-upgrades small->large when dim exceeds 1536 (provider_init.py:163-177)") {
    val sel = ProviderInit.select(
      Map("EMBEDDING_PROVIDER" -> "openai", "OPENAI_API_KEY" -> "k",
        "VECTOR_SIZE" -> "2048"),
      factory(2048, "openai"))
    assert(sel.provider.name == "openai:text-embedding-3-large")
    // explicit large model or non-small names pass through untouched
    assert(ProviderInit.resolveOpenAiModel("text-embedding-3-large", 2048) ==
      "text-embedding-3-large")
    assert(ProviderInit.resolveOpenAiModel("text-embedding-3-small", 1536) ==
      "text-embedding-3-small")
  }

  test("non-native OPENAI_BASE_URL flips the name to openai-compatible (openai.py:172-175)") {
    val sel = ProviderInit.select(
      Map("EMBEDDING_PROVIDER" -> "openai", "OPENAI_API_KEY" -> "k",
        "OPENAI_BASE_URL" -> "https://llm.example.com/v1"),
      factory(1024, "openai"))
    assert(sel.provider.name == "openai-compatible:text-embedding-3-small")
    val native = ProviderInit.select(
      Map("EMBEDDING_PROVIDER" -> "openai", "OPENAI_API_KEY" -> "k",
        "OPENAI_BASE_URL" -> "https://api.openai.com/v1"),
      factory(1024, "openai"))
    assert(native.provider.name == "openai:text-embedding-3-small")
  }

  test("explicit local picks the fastembed model for the dimension (fastembed.py:16-49)") {
    assert(ProviderInit.select(Map("EMBEDDING_PROVIDER" -> "local"),
      factory(1024, "fastembed")).provider.name == "fastembed:BAAI/bge-large-en-v1.5")
    assert(ProviderInit.select(
      Map("EMBEDDING_PROVIDER" -> "local", "VECTOR_SIZE" -> "384"),
      factory(384, "fastembed")).provider.name == "fastembed:BAAI/bge-small-en-v1.5")
    // unknown dimension -> base model fallback
    assert(ProviderInit.select(
      Map("EMBEDDING_PROVIDER" -> "local", "VECTOR_SIZE" -> "640"),
      factory(640, "fastembed")).provider.name == "fastembed:BAAI/bge-base-en-v1.5")
  }

  test("explicit ollama: defaults, env model, and strict env parsing (provider_init.py:142-163)") {
    val sel = ProviderInit.select(Map("EMBEDDING_PROVIDER" -> "ollama"),
      factory(1024, "ollama"))
    assert(sel.provider.name == "ollama:nomic-embed-text")
    val custom = ProviderInit.select(
      Map("EMBEDDING_PROVIDER" -> "ollama", "OLLAMA_MODEL" -> "mxbai-embed-large"),
      factory(1024, "ollama"))
    assert(custom.provider.name == "ollama:mxbai-embed-large")
    val e = intercept[SelectionError] {
      ProviderInit.select(
        Map("EMBEDDING_PROVIDER" -> "ollama", "OLLAMA_MAX_RETRIES" -> "lots"),
        factory(1024, "ollama"))
    }
    assert(e.message.contains("OLLAMA_MAX_RETRIES"))
  }

  test("auto prefers voyage over openai when both keys are set") {
    val sel = ProviderInit.select(
      Map("VOYAGE_API_KEY" -> "v", "OPENAI_API_KEY" -> "o"),
      factory(1024, allKinds: _*))
    assert(sel.kind == "voyage" && sel.autoSelected)
  }

  test("auto falls through voyage->openai on voyage failure, recording a warning") {
    // voyage transport unavailable (SDK-import failure analog)
    val sel = ProviderInit.select(
      Map("VOYAGE_API_KEY" -> "v", "OPENAI_API_KEY" -> "o"),
      factory(1024, "openai"))
    assert(sel.kind == "openai")
    assert(sel.warnings.exists(_.contains("Failed to initialize voyage")))
    // voyage dimension constraint also falls through rather than aborting
    val dims = ProviderInit.select(
      Map("VOYAGE_API_KEY" -> "v", "OPENAI_API_KEY" -> "o", "VECTOR_SIZE" -> "768"),
      factory(768, allKinds: _*))
    assert(dims.kind == "openai")
  }

  test("auto uses ollama only when its env is present, then fastembed, then placeholder") {
    val viaOllama = ProviderInit.select(
      Map("OLLAMA_BASE_URL" -> "http://localhost:11434"),
      factory(1024, "ollama", "fastembed"))
    assert(viaOllama.kind == "ollama")
    val viaFastembed = ProviderInit.select(Map.empty, factory(1024, "fastembed"))
    assert(viaFastembed.kind == "fastembed" && viaFastembed.autoSelected)
    val viaPlaceholder = ProviderInit.select(Map.empty, factory(1024))
    assert(viaPlaceholder.kind == "placeholder")
    assert(viaPlaceholder.provider.name == "placeholder")
    assert(viaPlaceholder.warnings.exists(_.contains("placeholder")))
    // placeholder still embeds deterministically at the effective dimension
    val v = viaPlaceholder.provider.embedBatch(Seq("same text"))
    assert(v.head.length == 1024)
    assert(v.head.toSeq == viaPlaceholder.provider.embedBatch(Seq("same text")).head.toSeq)
  }

  test("invalid auto-ollama env degrades to defaults instead of failing (provider_init.py:228-233)") {
    val sel = ProviderInit.select(
      Map("OLLAMA_MODEL" -> "nomic-embed-text", "OLLAMA_MAX_RETRIES" -> "NaN"),
      factory(1024, "ollama"))
    assert(sel.kind == "ollama")
    assert(sel.warnings.exists(_.contains("using defaults")))
  }

  test("collection dimension is adopted over config by default (validation.py:57-96)") {
    assert(ProviderInit.effectiveVectorSize(
      Map("VECTOR_SIZE" -> "1024"), Some(768)) == (768, "collection"))
    assert(ProviderInit.effectiveVectorSize(Map("VECTOR_SIZE" -> "1024"), None) ==
      (1024, "config"))
    // adoption drives model choice end-to-end: 768-d collection -> base model
    val sel = ProviderInit.select(Map("VECTOR_SIZE" -> "1024"),
      factory(768, "fastembed"), collectionDim = Some(768))
    assert(sel.provider.name == "fastembed:BAAI/bge-base-en-v1.5")
    assert(sel.provider.embedBatch(Seq("x")).head.length == 768)
  }

  test("VECTOR_SIZE_AUTODETECT=false makes a dimension mismatch fatal") {
    val e = intercept[SelectionError] {
      ProviderInit.effectiveVectorSize(
        Map("VECTOR_SIZE" -> "1024", "VECTOR_SIZE_AUTODETECT" -> "false"), Some(768))
    }
    assert(e.message.contains("mismatch"))
    // matching dimensions never raise, and truthy values keep adoption on
    assert(ProviderInit.effectiveVectorSize(
      Map("VECTOR_SIZE" -> "768", "VECTOR_SIZE_AUTODETECT" -> "false"), Some(768)) ==
      (768, "collection"))
    assert(ProviderInit.effectiveVectorSize(
      Map("VECTOR_SIZE" -> "1024", "VECTOR_SIZE_AUTODETECT" -> "true"), Some(768)) ==
      (768, "collection"))
  }

  test("invalid EMBEDDING_PROVIDER lists the valid options") {
    val e = intercept[SelectionError] {
      ProviderInit.select(Map("EMBEDDING_PROVIDER" -> "qwanda"), factory(1024))
    }
    assert(e.message.contains("auto, voyage, openai, local, ollama, placeholder"))
  }

  test("selected providers run the Spark embed stage end-to-end") {
    import spark.implicits._
    val sel = ProviderInit.select(
      Map("OPENAI_API_KEY" -> "k", "VECTOR_SIZE" -> "8"), factory(8, "openai"))
    val df = Seq(("a", "hello"), ("b", "world")).toDF("id", "content")
    val out = EmbeddingStage.embed(df, sel.provider).collect()
    assert(out.length == 2)
    assert(out.forall(_.getSeq[Float](2).length == 8))
  }

  test("keyless auto with a cached local model selects fastembed and embeds " +
    "real (non-placeholder) vectors through the Spark stage") {
    import spark.implicits._
    // write a tiny model in the cache-dir convention the reference checks
    // (fastembed.py:58-69): AUTOMEM_MODELS_DIR/<model with / -> -->/
    val cache = java.nio.file.Files.createTempDirectory("fe-models")
    val dim = 4
    val modelDir = cache.resolve(
      FastEmbedTransport.modelDirName("BAAI/bge-base-en-v1.5"))
    FastEmbedTransport.writeModel(modelDir,
      vocab = Seq("hello", "world", "kiln"),
      matrix = Seq(
        Array(1f, 0f, 0f, 0f),
        Array(0f, 1f, 0f, 0f),
        Array(0f, 0f, 2f, 0f)))
    val env = Map("AUTOMEM_MODELS_DIR" -> cache.toString, "VECTOR_SIZE" -> "4")
    // the REAL factory (not a fake): keyless env, no ollama env -> the
    // auto chain's fastembed branch must find the cached model
    val sel = ProviderInit.select(env, new HttpTransportFactory(env, dim))
    assert(sel.kind == "fastembed" && sel.autoSelected)
    assert(sel.provider.name == "fastembed:BAAI/bge-base-en-v1.5")
    val df = Seq(("a", "Hello WORLD"), ("b", "kiln"), ("c", "zzz unknown"))
      .toDF("id", "content")
    val out = EmbeddingStage.embed(df, sel.provider).collect()
      .map(r => r.getString(0) -> r.getSeq[Float](2)).toMap
    // mean-pooled + L2-normalized lookup: ("hello"+"world")/2 normalized
    val s = (1.0 / math.sqrt(0.5)).toFloat / 2
    assert(out("a") == Seq(s, s, 0f, 0f))
    assert(out("b") == Seq(0f, 0f, 1f, 0f), "single-token rows normalize to unit")
    assert(out("c") == Seq(0f, 0f, 0f, 0f), "OOV-only text embeds to zero")
    // and they are NOT the placeholder hash vectors
    val placeholder = new PlaceholderProvider(dim)
    assert(out("a") != placeholder.embedBatch(Seq("Hello WORLD")).head.toSeq)
    // without the model cached, the same keyless env degrades to placeholder
    val bare = Map("VECTOR_SIZE" -> "4")
    val none = ProviderInit.select(bare, new HttpTransportFactory(bare, dim))
    assert(none.kind == "placeholder")
  }
  lazy val spark = SparkTestSession.spark
}
