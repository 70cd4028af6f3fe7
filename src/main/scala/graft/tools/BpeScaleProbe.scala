package graft.tools

import org.apache.spark.sql.SparkSession

/** BPE at corpus scale (VERDICT r10 item 8): train on the sf0.1 documents
  * with a hash sample, record PER-ROUND wall time (each merge round is one
  * explode+groupBy+argmax pass over the working corpus), and measure the
  * merge-table agreement across two different sample seeds — tokenizer
  * reproducibility from a sample is the point of the deterministic
  * sampling design.
  *
  * Run: `sbt "runMain graft.tools.BpeScaleProbe [sfDir] [fraction] [merges]"`
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val fraction = args.lift(1).map(_.toDouble).getOrElse(0.2)
    val numMerges = args.lift(2).map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir).select("text").cache()
    val n = docs.count()
    println(s"[bpescale] corpus $sfDir: $n docs, fraction=$fraction, merges=$numMerges")

    // Sample-stability matrix (VERDICT r11 item 8): cross-seed merge
    // overlap AND downstream fertility at fractions {0.2, 0.5, 1.0} x two
    // seeds — the question is the smallest sample at which the merge
    // table stops depending on WHICH sample was drawn (>= 28/30 overlap).
    // fraction 1.0 is the trivial anchor (the "sample" is the corpus, so
    // both seeds see identical data).
    if (sys.env.contains("BPE_MATRIX")) {
      for (f <- Seq(0.2, 0.5, 1.0)) {
        val a = graft.operators.Bpe.train(docs, "text", numMerges,
          sampleFraction = f, seed = 1L)
        val b = graft.operators.Bpe.train(docs, "text", numMerges,
          sampleFraction = f, seed = 2L)
        val overlap = (a.toSet & b.toSet).size
        val prefix = a.zip(b).takeWhile { case (x, y) => x == y }.size
        val fa = graft.operators.Bpe.fertility(docs, "text", a)
        val fb = graft.operators.Bpe.fertility(docs, "text", b)
        println(f"[bpematrix] fraction=$f%.1f overlap=$overlap/${a.size} " +
          f"prefix=$prefix fertility seed1=$fa%.4f seed2=$fb%.4f " +
          f"drift=${math.abs(fa - fb)}%.4f")
      }
      docs.unpersist(); spark.stop(); return
    }

    val times = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t0 = System.nanoTime()
    val m1 = graft.operators.Bpe.train(docs, "text", numMerges,
      sampleFraction = fraction, seed = 1L,
      onRound = (r, s) => { times += s
        if (r <= 3 || r % 10 == 0) println(f"[bpescale] round $r%3d $s%6.2f s") })
    val total = (System.nanoTime() - t0) / 1e9
    println(f"[bpescale] seed=1 total=$total%.1f s, ${m1.size} merges, " +
      f"per-round median=${times.sorted.apply(times.size / 2)}%.2f s " +
      f"first=${times.head}%.2f last=${times.last}%.2f " +
      "(rounds cheapen as merges shrink the symbol stream)")

    val m2 = graft.operators.Bpe.train(docs, "text", numMerges,
      sampleFraction = fraction, seed = 2L)
    val prefix = m1.zip(m2).takeWhile { case (a, b) => a == b }.size
    val overlap = (m1.toSet & m2.toSet).size
    println(f"[bpescale] cross-seed stability: identical prefix $prefix/${m1.size}, " +
      f"set overlap $overlap/${m1.size} — two DIFFERENT $fraction%.2f samples")
    docs.unpersist()
    spark.stop()
  }
}
