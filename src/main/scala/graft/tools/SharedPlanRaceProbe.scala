package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}

/** Minimal STANDALONE repro of the shared-physical-plan race (VERDICT r11
  * item 4) — no graft plans involved, plain Spark 4.1.2 primitives only.
  *
  * Mechanics mirror [[graft.domain.PreparedRecall]]'s fast path: build ONE
  * physical plan against a marker 1-row "request" LocalRelation joined to a
  * cached corpus, then per call swap fresh request rows into the
  * LocalTableScan via `transformUp` (copy-on-write: ancestors of the
  * swapped scan are fresh per call, everything else is SHARED between
  * concurrent calls). Two threads then `executeCollect()` their swapped
  * trees concurrently; every result is checked against a single-threaded
  * run of the SAME swap mechanics for that parameter, so concurrency is
  * the only variable.
  *
  * Modes:
  *   - default: shared static nodes (the r11 race conditions) — counts
  *     divergent results over `RACE_TRIALS` (default 40) trials;
  *   - RACE_CLONE=1: deep-clone per call before the swap (the shipped
  *     backstop) — must be 0 divergent;
  *   - RACE_BISECT=1: after a divergent shared run, re-runs trials where
  *     everything is PRIVATE except one node class at a time
  *     (`cloneExcept`), to name the class whose sharing diverges. Subtree
  *     privatization cannot go through `transformUp`/`withNewChildren` —
  *     Catalyst discards ==-equal replacements (fastEquals), and a clone
  *     IS ==-equal — so the rebuild goes through `makeCopy` directly.
  *
  * An identity sweep (`System.identityHashCode` of every node) prints
  * which classes are actually shared between the two threads' trees.
  */
object SharedPlanRaceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    // cached corpus, serving-shaped plan: broadcast 1-row request x corpus
    // -> filter -> aggregate -> sort/limit (exchange + codegen + broadcast,
    // the node families the serving template contains)
    val corpus = spark.range(0, 10000).toDF("id")
      .withColumn("v", $"id" % 100)
      .withColumn("w", ($"id" * 31 % 997).cast("long"))
      .cache()
    corpus.count()

    import org.apache.spark.sql.functions._
    def logical(p: Long) = corpus
      .join(broadcast(Seq(p).toDF("p")), $"v" === $"p")
      .groupBy($"p").agg(sum($"id").as("s"), count(lit(1)).as("n"),
        max($"w").as("m"))
      .orderBy($"p").limit(5)

    // the template, planned once against marker p = -1 (matches nothing)
    val template: SparkPlan = logical(-1L).queryExecution.executedPlan
    def swap(base: SparkPlan, p: Long): SparkPlan = base.transformUp {
      case l: LocalTableScanExec if l.output.map(_.name) == Seq("p") =>
        l.copy(rows = Seq(new GenericInternalRow(Array[Any](p))))
    }
    def values(p: SparkPlan): String =
      p.executeCollect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)).toString)
        .mkString(";")

    // identity sweep: which node instances are shared between two trees?
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val buf = scala.collection.mutable.ArrayBuffer[SparkPlan]()
      p.foreach(n => buf += n)
      buf.toSeq
    }
    val idsA = nodes(swap(template, 1L)).map(System.identityHashCode).toSet
    val shared = nodes(swap(template, 2L))
      .filter(n => idsA.contains(System.identityHashCode(n)))
    println(s"[shared-nodes] ${shared.size} shared between two swapped " +
      s"trees: ${shared.map(_.getClass.getSimpleName).distinct.mkString(", ")}")

    // rebuild bypassing fastEquals: private copies of every node except
    // those satisfying `keepShared` (matched by reference identity)
    def cloneExcept(p: SparkPlan, keepShared: SparkPlan => Boolean): SparkPlan =
      if (keepShared(p)) p
      else {
        val rebuilt = p.children.map(c => cloneExcept(c, keepShared))
        val byId = p.children.zip(rebuilt)
          .map { case (o, n) => System.identityHashCode(o) -> n }.toMap
        def sub(a: Any): AnyRef = a match {
          case c: SparkPlan if byId.contains(System.identityHashCode(c)) =>
            byId(System.identityHashCode(c))
          case s: Seq[_] => s.map(sub)
          case other => other.asInstanceOf[AnyRef]
        }
        p.makeCopy(p.productIterator.map(sub).toArray)
      }

    val trials = sys.env.getOrElse("RACE_TRIALS", "40").toInt
    def runTrials(tag: String, mkTree: Long => SparkPlan): Int = {
      var divergent = 0
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        for (t <- 1 to trials) {
          val (pa, pb) = ((t % 8).toLong, ((t + 3) % 8).toLong)
          def call(p: Long) = pool.submit(
            new java.util.concurrent.Callable[String] {
              def call(): String = values(mkTree(p))
            })
          val (fa, fb) = (call(pa), call(pb))
          val (ra, rb) = (fa.get(), fb.get())
          // single-threaded reference through the same mechanics
          if (values(mkTree(pa)) != ra) divergent += 1
          if (values(mkTree(pb)) != rb) divergent += 1
        }
      } finally pool.shutdownNow()
      println(s"[$tag] $divergent divergent of ${trials * 2} calls")
      divergent
    }

    if (sys.env.contains("RACE_CLONE"))
      runTrials("cloned", p => swap(template.clone().asInstanceOf[SparkPlan], p))
    else {
      val d = runTrials("shared", p => swap(template, p))
      if (d > 0 && sys.env.contains("RACE_BISECT")) {
        val classes = shared.map(_.getClass.getSimpleName).distinct
        classes.foreach { cls =>
          val dd = runTrials(s"share-only-$cls", p =>
            swap(cloneExcept(template,
              n => n.getClass.getSimpleName == cls), p))
          if (dd > 0)
            println(s"[bisect] sharing only $cls DIVERGES -> stateful class")
        }
        println(s"[bisect] classes swept: ${classes.mkString(", ")}")
        // name the mechanism: which shared classes participate in
        // whole-stage codegen? CodegenSupport carries a MUTABLE `parent`
        // field written during the produce/consume compilation walk —
        // concurrent walks over a shared node cross-wire the generated
        // program. Measured here: both CodegenSupport classes diverge,
        // the non-CodegenSupport leaf does not.
        shared.map(n => n.getClass.getSimpleName ->
            n.isInstanceOf[org.apache.spark.sql.execution.CodegenSupport])
          .distinct.foreach { case (cls, cg) =>
            println(s"[mechanism] $cls isCodegenSupport=$cg")
          }
      }
    }
    spark.stop()
  }
}
