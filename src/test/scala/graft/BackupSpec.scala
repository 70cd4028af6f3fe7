package graft

import graft.domain._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S6 backup/restore roundtrip (`automem/backup.py`,
  * `scripts/restore_from_backup.py`): snapshot write -> mutate the corpus ->
  * restore -> relation-level compare, plus include parsing, merge-vs-replace
  * semantics, prop restoration, retention cleanup, and latest-snapshot
  * resolution.
  */
class BackupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkCorpus() = {
    val memories = Ingest.prepare(
      (1 to 20).map(i => (s"Decided to use backup plan $i", Seq(s"tag$i")))
        .toDF("content", "tags"), dim = 8)
      .withColumn("id", concat(lit("m"), row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("content")).cast("string")))
    val edges = Seq(
      ("m1", "m2", "RELATES_TO"), ("m2", "m3", "LEADS_TO"), ("m4", "m5", "PRECEDED_BY"))
      .toDF("src", "dst", "rel_type")
      .withColumn("updated_at", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val patterns = Seq(("p1", "Pattern", "recurring backup habit", 0.9, 4L))
      .toDF("id", "type", "content", "confidence", "observations")
    (memories.cache(), edges, patterns)
  }

  test("parseBackupInclude mirrors backup.py:45-59") {
    assert(Backup.parseBackupInclude(None) == Seq("graph", "vectors"))
    assert(Backup.parseBackupInclude(Some("vectors")) == Seq("vectors"))
    assert(Backup.parseBackupInclude(Some(" GRAPH , vectors ")) == Seq("graph", "vectors"))
    intercept[Backup.InvalidBackupInclude] { Backup.parseBackupInclude(Some("qdrant")) }
    intercept[Backup.InvalidBackupInclude] { Backup.parseBackupInclude(Some("graph,,")) }
    intercept[Backup.InvalidBackupInclude] { Backup.parseBackupInclude(Some("")) }
  }

  test("backup timestamp is UTC yyyyMMdd_HHmmss (backup.py:41-42)") {
    assert(Backup.backupTimestamp(0L) == "19700101_000000")
    assert(Backup.backupTimestamp(1700000000000L) == "20231114_221320")
  }

  test("full roundtrip: backup -> drop rows -> restore replaces them exactly") {
    val (mem, edges, patterns) = mkCorpus()
    val dir = java.nio.file.Files.createTempDirectory("graft-backup").toString
    val ts = Backup.backupTimestamp(1700000000000L)
    val stats = Backup.backup(mem, edges, patterns, dir, ts)
    assert(stats("graph")("node_count") == 21 && stats("graph")("relationship_count") == 3)
    assert(stats("vectors")("points_count") == 20 && stats("vectors")("vector_size") == 8)

    val restoreMillis = 1700000100000L
    val r = Backup.restore(spark, dir, restoreMillis)
    // every relation hash-compares to the original, modulo the reference's
    // deliberate prop rewrites (last_accessed refresh)
    val origCore = mem.drop("last_accessed").orderBy("id").collect().toSeq
    val restCore = r.memories.drop("last_accessed").orderBy("id").collect().toSeq
    assert(restCore == origCore, "memories must roundtrip byte-identically minus last_accessed")
    assert(r.edges.orderBy("src", "dst").collect().toSeq ==
      edges.orderBy("src", "dst").collect().toSeq)
    assert(r.patterns.collect().toSeq == patterns.collect().toSeq)
    // last_accessed becomes the restore time on every row (restore_from_backup.py:223-226)
    val la = r.memories.select(col("last_accessed")).distinct().collect()
    assert(la.length == 1 && la.head.getTimestamp(0).getTime == restoreMillis)
    // vectors service roundtrips the points projection
    val pts = Backup.restoreVectors(spark, dir)
    assert(pts.count() == 20)
    assert(pts.select(size(col("embedding"))).distinct().head().getInt(0) == 8)
  }

  test("null relevance_score back-fills to max(0.3, importance) on restore") {
    val (mem, edges, patterns) = mkCorpus()
    val weird = mem
      .withColumn("relevance_score",
        when(col("id") === "m1", lit(null).cast("double"))
          .otherwise(col("relevance_score")))
      .withColumn("importance",
        when(col("id") === "m1", 0.9).otherwise(col("importance")))
    val dir = java.nio.file.Files.createTempDirectory("graft-backup").toString
    Backup.backup(weird, edges, patterns, dir, "20240101_000000")
    val r = Backup.restore(spark, dir, 0L)
    val m1 = r.memories.filter(col("id") === "m1").head()
    assert(m1.getAs[Double]("relevance_score") == 0.9)
    // non-null scores pass through untouched
    val m2 = r.memories.filter(col("id") === "m2").head()
    assert(m2.getAs[Double]("relevance_score") ==
      mem.filter(col("id") === "m2").head().getAs[Double]("relevance_score"))
  }

  test("merge restore keeps existing rows and fills only the gaps") {
    val (mem, edges, patterns) = mkCorpus()
    val dir = java.nio.file.Files.createTempDirectory("graft-backup").toString
    Backup.backup(mem, edges, patterns, dir, "20240101_000000")
    // mutate: drop m1/m2, rewrite m3's content, drop one edge
    val mutated = Backup.Restored(
      mem.filter(!col("id").isin("m1", "m2"))
        .withColumn("content",
          when(col("id") === "m3", lit("locally edited")).otherwise(col("content"))),
      edges.filter(col("src") =!= "m1"),
      patterns)
    val r = Backup.restore(spark, dir, 0L, existing = Some(mutated), merge = true)
    assert(r.memories.count() == 20, "dropped ids come back")
    // existing wins on collision: the local edit survives
    assert(r.memories.filter(col("id") === "m3").head().getAs[String]("content") ==
      "locally edited")
    // the restored m1 carries the backup content
    assert(r.memories.filter(col("id") === "m1").head()
      .getAs[String]("content").startsWith("Decided to use backup plan"))
    assert(r.edges.count() == 3)
  }

  test("restore refuses a truncated snapshot with a clean error") {
    val (mem, edges, patterns) = mkCorpus()
    val dir = java.nio.file.Files.createTempDirectory("graft-backup-trunc").toString
    val ts = Backup.backupTimestamp(1700000000000L)
    // multi-file snapshot so one lost part-file is a COUNT mismatch (a
    // single-file dir would fail at read time instead - also covered below)
    Backup.backup(mem.repartition(4), edges, patterns, dir, ts)
    // simulate a lost part-file / interrupted copy: delete one memories
    // parquet data file (keep _SUCCESS so the dir still LOOKS complete)
    val memDir = java.nio.file.Paths.get(dir, "graph", ts, "memories")
    val victim = {
      val s = java.nio.file.Files.list(memDir)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    java.nio.file.Files.delete(victim)
    val e = intercept[Backup.CorruptBackup] {
      Backup.restore(spark, dir, 1700000100000L)
    }
    assert(e.message.contains("truncated") && e.message.contains(ts),
      s"unexpected message: ${e.message}")
    // vectors service validates the same way
    val ptsDir = java.nio.file.Paths.get(dir, "vectors", ts, "points")
    val pvictim = {
      val s = java.nio.file.Files.list(ptsDir)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    java.nio.file.Files.delete(pvictim)
    intercept[Backup.CorruptBackup] { Backup.restoreVectors(spark, dir) }
    // a missing manifest is also a refusal, not a silent unchecked restore
    val (m2, e2, p2) = mkCorpus()
    val dir2 = java.nio.file.Files.createTempDirectory("graft-backup-noman").toString
    Backup.backup(m2, e2, p2, dir2, ts)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir2, "graph", ts, "manifest.json"))
    // without a manifest the snapshot is not even discoverable as latest
    assert(Backup.latestTimestamp(dir2, "graph").isEmpty)
    val e3 = intercept[Backup.CorruptBackup] {
      Backup.restore(spark, dir2, 1700000100000L, timestamp = Some(ts))
    }
    assert(e3.message.contains("manifest"))
  }

  test("latestTimestamp + cleanupOldBackups retention (backup.py:331-343)") {
    val (mem, edges, patterns) = mkCorpus()
    val dir = java.nio.file.Files.createTempDirectory("graft-backup").toString
    Seq("20240101_000000", "20240102_000000", "20240103_000000")
      .foreach(ts => Backup.backup(mem, edges, patterns, dir, ts))
    assert(Backup.latestTimestamp(dir, "graph").contains("20240103_000000"))
    val cleaned = Backup.cleanupOldBackups(dir, keep = 2)
    assert(cleaned("graph") == (2, 1) && cleaned("vectors") == (2, 1))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "graph", "20240101_000000")))
    // the kept snapshots still restore
    assert(Backup.restore(spark, dir, 0L).memories.count() == 20)
    assert(Backup.latestTimestamp(dir, "graph").contains("20240103_000000"))
  }
}
