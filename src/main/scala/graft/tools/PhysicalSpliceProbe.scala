package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.LocalTableScanExec

/** Measures the r10 serving-stretch question: can the no-knobs fast path
  * cache the PHYSICAL plan and swap only the request rows, skipping the
  * per-call ~100 ms optimizer + ~25 ms physical-planning cost that
  * dominates a prepared single recall's fixed overhead?
  *
  * Feasibility gate first: after full optimization of the template (all
  * folding rules ON — excluding them is the splice-safety tax that killed
  * the r8/r9 serveRows attempt), does the marker request survive ONLY as
  * `LocalTableScanExec` rows, or did ConvertToLocalRelation /
  * FoldablePropagation bake request values into expressions elsewhere?
  * Prints every physical occurrence of the marker so the verdict is
  * decided by evidence, not hope.
  */
object PhysicalSpliceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val memories = LabCorpus.corpus(spark).repartition(4).cache()
    memories.count()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    val prepared = new graft.domain.PreparedRecall(memories,
      spark.emptyDataFrame, limit = 10, now = LabCorpus.Now,
      vocabParallelism = 4)
    val marker = "zeta0z quasar0z deployment"
    val df = prepared.recall(marker)
    val phys = df.queryExecution.executedPlan

    // where does the request text land in the physical plan?
    var scans = 0; var others = 0
    phys.foreach {
      case l: LocalTableScanExec =>
        val hit = l.rows.exists(_.toString.contains("zeta0z"))
        if (hit) { scans += 1
          println(s"[scan ] LocalTableScanExec(${l.output.map(_.name).mkString(",")}) carries the request")
        }
      case p =>
        val s = p.simpleStringWithNodeId()
        // expressions stringify into the node's verboseString args
        val argHit = p.expressions.exists(_.toString.contains("zeta0z"))
        if (argHit) { others += 1
          println(s"[exprs] ${p.getClass.getSimpleName}: ${p.expressions.filter(_.toString.contains("zeta0z")).mkString(" | ").take(400)}")
        }
        val _ = s
    }
    println(s"[verdict] request in $scans LocalTableScanExec node(s), " +
      s"baked into expressions of $others other node(s) -> " +
      (if (others == 0 && scans > 0) "physical row-swap is shape-feasible"
       else "request folds into expressions; physical splice needs per-call re-fold"))
    spark.stop()
  }
}
