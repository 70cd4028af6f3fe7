package graft.domain

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6: backup/restore roundtrip (reference `automem/backup.py:1-426` +
  * `scripts/restore_from_backup.py`).
  *
  * The reference exports each store (FalkorDB graph, Qdrant points) as a
  * gzip-JSON artifact named `<service>/<service>_<timestamp>.json.gz`, and
  * restores by batch-MERGEing nodes/relationships back, refreshing
  * `last_accessed` and back-filling `relevance_score` from importance. The
  * Spark-native artifact is a PARQUET snapshot per relation under
  * `<dir>/<service>/<timestamp>/` plus a driver-written manifest with the
  * same stats the reference records (node/relationship/point counts, vector
  * size): columnar, splittable, and restorable by `spark.read.parquet` at
  * any scale — gzip-JSON streaming through a tarfile is single-node Flask
  * plumbing (`backup.py:345-426`), out of scope per SURVEY §1.5.
  *
  * Service names map: `graph` = the reference's falkordb export (memories +
  * edges + patterns relations), `vectors` = the qdrant export (id +
  * embedding + payload projection of memories).
  */
object Backup {

  /** `backup.py:14` VALID_BACKUP_INCLUDES, re-expressed for the
    * single-table engine's two logical stores.
    */
  val ValidIncludes: Seq[String] = Seq("graph", "vectors")

  case class InvalidBackupInclude(message: String) extends IllegalArgumentException(message)

  /** `backup.py:41-42`: UTC second-resolution timestamp; lexicographic order
    * == chronological order, which `latestTimestamp` relies on.
    */
  def backupTimestamp(epochMillis: Long): String = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
      .withZone(java.time.ZoneOffset.UTC)
    fmt.format(java.time.Instant.ofEpochMilli(epochMillis))
  }

  /** `backup.py:45-59`: comma-separated include list; absent means both
    * stores; any invalid or empty token is an error.
    */
  def parseBackupInclude(raw: Option[String]): Seq[String] = raw match {
    case None => ValidIncludes
    case Some(s) =>
      val parts = s.split(",", -1).map(_.trim.toLowerCase).toSeq
      val includes = ValidIncludes.filter(parts.contains)
      val invalid = parts.filter(p => p.nonEmpty && !ValidIncludes.contains(p))
      if (invalid.nonEmpty || includes.isEmpty || parts.exists(_.isEmpty))
        throw InvalidBackupInclude(
          s"include must be a comma-separated subset of: ${ValidIncludes.mkString(",")}")
      includes
  }

  /** Write one backup: parquet snapshot per included service + manifest.
    * Returns per-service stats (the reference's BackupArtifact.stats).
    */
  def backup(memories: DataFrame, edges: DataFrame, patterns: DataFrame,
      dir: String, timestamp: String,
      includes: Seq[String] = ValidIncludes): Map[String, Map[String, Long]] = {
    val stats = scala.collection.mutable.Map.empty[String, Map[String, Long]]
    if (includes.contains("graph")) {
      val base = s"$dir/graph/$timestamp"
      memories.write.mode("overwrite").parquet(s"$base/memories")
      edges.write.mode("overwrite").parquet(s"$base/edges")
      patterns.write.mode("overwrite").parquet(s"$base/patterns")
      stats("graph") = Map(
        "node_count" -> (memories.count() + patterns.count()),
        "relationship_count" -> edges.count())
    }
    if (includes.contains("vectors")) {
      val base = s"$dir/vectors/$timestamp"
      // headOption: an EMPTY store must still produce a complete (empty)
      // snapshot + manifest, not crash mid-backup leaving a partial dir
      val dim = memories.select(size(col("embedding"))).limit(1).collect()
        .headOption.map(_.getInt(0).toLong).getOrElse(0L)
      memories.select(col("id"), col("embedding"), col("type"), col("tags"),
          col("timestamp"), col("importance"))
        .write.mode("overwrite").parquet(s"$base/points")
      stats("vectors") = Map(
        "points_count" -> memories.count(),
        "vector_size" -> dim)
    }
    val manifest = stats.toSeq.sortBy(_._1).map { case (svc, m) =>
      "\"" + svc + "\":" + m.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    }.mkString(s"""{"timestamp":"$timestamp","artifacts":{""", ",", "}}")
    includes.foreach { svc =>
      val p = Paths.get(dir, svc, timestamp, "manifest.json")
      Files.createDirectories(p.getParent)
      Files.write(p, manifest.getBytes(StandardCharsets.UTF_8))
    }
    stats.toMap
  }

  /** Latest backup timestamp for a service (`restore_from_backup.py:556-566`
    * find_latest_backup — the reference sorts file names; the timestamp
    * format makes name order chronological).
    */
  /** Child names of a directory with the stream CLOSED (Files.list leaks a
    * directory file descriptor until GC otherwise).
    */
  private def childNames(p: java.nio.file.Path): Seq[String] = {
    val s = Files.list(p)
    try s.toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
    finally s.close()
  }

  def latestTimestamp(dir: String, service: String): Option[String] = {
    val p = Paths.get(dir, service)
    if (!Files.isDirectory(p)) None
    else {
      val names = childNames(p)
        .filter(n => Files.exists(Paths.get(dir, service, n, "manifest.json")))
      if (names.isEmpty) None else Some(names.max)
    }
  }

  case class Restored(memories: DataFrame, edges: DataFrame, patterns: DataFrame)

  case class CorruptBackup(message: String) extends IllegalStateException(message)

  /** Parse a snapshot's manifest stats for one service. Returns a lookup
    * that raises [[CorruptBackup]] for a missing stat key — a malformed
    * manifest must surface through the same typed refusal as every other
    * validation failure, not a bare NoSuchElementException.
    */
  private def manifestStats(dir: String, service: String,
      ts: String): String => Long = {
    val p = Paths.get(dir, service, ts, "manifest.json")
    if (!Files.isRegularFile(p))
      throw CorruptBackup(s"snapshot $service/$ts has no manifest.json")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    val svc = root.path("artifacts").path(service)
    if (!svc.isObject)
      throw CorruptBackup(s"manifest for $service/$ts lacks artifact stats")
    val stats = svc.properties().iterator().asScala
      .map(e => e.getKey -> e.getValue.asLong()).toMap
    key => stats.getOrElse(key, throw CorruptBackup(
      s"manifest for $service/$ts lacks required stat '$key'"))
  }

  /** Read one snapshot relation; an unreadable dir (all part-files lost,
    * schema gone) is the same refusal as a count mismatch.
    */
  private def readRelation(spark: SparkSession, path: String,
      ts: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw CorruptBackup(
          s"snapshot $ts is truncated or corrupt: cannot read $path " +
            s"(${e.getMessage.linesIterator.next()})")
    }

  private def requireCount(what: String, got: Long, want: Long, ts: String): Unit =
    if (got != want) throw CorruptBackup(
      s"snapshot $ts is truncated or corrupt: $what has $got rows but the " +
        s"manifest recorded $want — refusing to restore partial data " +
        "(re-run backup or restore an older snapshot)")

  /** Restore the graph service from a snapshot (latest by default).
    *
    * Reference semantics ported from `restore_from_backup.py:223-281`:
    *   - every restored memory's `last_accessed` becomes the restore time;
    *   - a missing/null `relevance_score` back-fills to
    *     `max(0.3, importance)` (importance null -> 0.5);
    *   - `merge = true` keeps EXISTING rows on id collision and appends only
    *     new ids (the reference skips nodes whose uuid already exists);
    *     `merge = false` is a full replace.
    */
  def restore(spark: SparkSession, dir: String, restoreTimeMillis: Long,
      timestamp: Option[String] = None,
      existing: Option[Restored] = None, merge: Boolean = false): Restored = {
    val ts = timestamp.orElse(latestTimestamp(dir, "graph")).getOrElse(
      throw new IllegalStateException(s"no graph backup under $dir"))
    val base = s"$dir/graph/$ts"
    // validate against the manifest BEFORE handing frames to the caller —
    // a truncated snapshot dir (lost part-files, interrupted copy) must be
    // a clean refusal, not a silently smaller corpus (the reference's
    // restore verifies restored counts the same way,
    // `restore_from_backup.py:541-552,795-797`)
    val want = manifestStats(dir, "graph", ts)
    val memRaw = readRelation(spark, s"$base/memories", ts)
    val patRaw = readRelation(spark, s"$base/patterns", ts)
    requireCount("memories+patterns", memRaw.count() + patRaw.count(),
      want("node_count"), ts)
    requireCount("edges", readRelation(spark, s"$base/edges", ts).count(),
      want("relationship_count"), ts)
    val restoreTs = new java.sql.Timestamp(restoreTimeMillis)
    val mem = memRaw
      .withColumn("last_accessed", lit(restoreTs))
      .withColumn("relevance_score",
        coalesce(col("relevance_score"),
          greatest(lit(0.3), coalesce(col("importance"), lit(0.5)))))
    val edg = spark.read.parquet(s"$base/edges")
    val pat = patRaw
    existing match {
      case Some(ex) if merge =>
        // anti-join on id: existing rows win, backup fills the gaps — the
        // distributed form of the reference's existing-uuid skip set
        val newMem = mem.join(ex.memories.select(col("id")), Seq("id"), "left_anti")
        val newPat = pat.join(ex.patterns.select(col("id")), Seq("id"), "left_anti")
        val edgeKey = Seq("src", "dst", "rel_type")
        val newEdg = edg.join(ex.edges.select(edgeKey.map(col): _*), edgeKey, "left_anti")
        Restored(
          ex.memories.unionByName(newMem),
          ex.edges.unionByName(newEdg),
          ex.patterns.unionByName(newPat))
      case _ => Restored(mem, edg, pat)
    }
  }

  /** Read back the vectors service (points projection). */
  def restoreVectors(spark: SparkSession, dir: String,
      timestamp: Option[String] = None): DataFrame = {
    val ts = timestamp.orElse(latestTimestamp(dir, "vectors")).getOrElse(
      throw new IllegalStateException(s"no vectors backup under $dir"))
    val pts = readRelation(spark, s"$dir/vectors/$ts/points", ts)
    requireCount("points", pts.count(),
      manifestStats(dir, "vectors", ts)("points_count"), ts)
    pts
  }

  /** `backup.py:331-343` cleanup_old_backup_files: keep the newest `keep`
    * snapshots per service, delete the rest.
    */
  def cleanupOldBackups(dir: String, keep: Int): Map[String, (Int, Int)] =
    ValidIncludes.map { svc =>
      val p = Paths.get(dir, svc)
      val all =
        if (!Files.isDirectory(p)) Seq.empty[String]
        else childNames(p).sorted.reverse
      // only COMPLETE snapshots (manifest present — the same filter
      // latestTimestamp applies) count toward the keep quota: an aborted
      // partial dir must never displace a restorable backup. Partial dirs
      // are deleted outright — they are unrestorable garbage.
      val (complete, partial) = all.partition(n =>
        Files.exists(Paths.get(dir, svc, n, "manifest.json")))
      val (kept, doomed) = complete.splitAt(keep)
      (doomed ++ partial).foreach { n =>
        val root = Paths.get(dir, svc, n)
        val w = Files.walk(root)
        try w.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
          .sortBy(_.getNameCount)(Ordering[Int].reverse)
          .foreach(Files.deleteIfExists(_))
        finally w.close()
      }
      svc -> (kept.length, doomed.length + partial.length)
    }.toMap
}
