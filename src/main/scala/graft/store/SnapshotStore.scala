package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-*semantics* snapshot store over plain Parquet (SURVEY.md §7.4).
  *
  * No Iceberg jars ship in this environment, so the observable properties
  * the north rule needs — snapshot isolation, exact resume, time travel to
  * batch i, per-partition lineage — are provided by: one immutable Parquet
  * directory per (table, snapshot), a manifest JSON per snapshot recording
  * the data path + row count + lineage note, and an atomically-renamed
  * `_latest.json` pointer. Readers only ever follow a fully-written
  * manifest, writers never mutate a committed snapshot. Swapping in a real
  * Iceberg catalog touches only this file.
  */
final class SnapshotStore(root: String) {

  private def tableDir(table: String) = Paths.get(root, table)
  private def snapshotDir(table: String, snapshot: Long) =
    tableDir(table).resolve(f"snap-$snapshot%06d")

  /** Commit `df` as snapshot `snapshot` of `table`. Data first, manifest
    * second, pointer rename last — a crash leaves either the old or the
    * new snapshot fully visible, never a torn one. The manifest row count
    * rides the write as an observed metric: one evaluation per commit. */
  def commit(table: String, snapshot: Long, df: DataFrame,
      lineage: Map[String, String] = Map.empty): Unit = {
    val dir = snapshotDir(table, snapshot)
    val dataPath = dir.resolve("data").toString
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write.mode("overwrite").parquet(dataPath)
    val rows = obs.get("rows").asInstanceOf[Long]

    val lineageJson = lineage.map { case (k, v) =>
      s""""${escape(k)}":"${escape(v)}""""
    }.mkString("{", ",", "}")
    // per-partition lineage: every data file (one per write partition)
    // with its byte size — read straight from the written directory, no
    // extra Spark job; a resume can verify parts individually
    val partsJson = {
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(dataPath))
        .iterator()
      val buf = scala.collection.mutable.ListBuffer[String]()
      while (files.hasNext) {
        val f = files.next()
        val n = f.getFileName.toString
        if (n.startsWith("part-"))
          buf += s""""${escape(n)}":${java.nio.file.Files.size(f)}"""
      }
      buf.sorted.mkString("{", ",", "}")
    }
    val manifest =
      s"""{"table":"${escape(table)}","snapshot":$snapshot,
         |"data":"${escape(dataPath)}","rows":$rows,
         |"partitions":$partsJson,
         |"lineage":$lineageJson}""".stripMargin.replace("\n", "")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("manifest.json"), manifest)

    val tmp = tableDir(table).resolve("_latest.json.tmp")
    Files.createDirectories(tableDir(table))
    Files.writeString(tmp, manifest)
    Files.move(tmp, tableDir(table).resolve("_latest.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Latest committed snapshot id of `table`, if any. */
  def latestSnapshot(table: String): Option[Long] = {
    val p = tableDir(table).resolve("_latest.json")
    if (!Files.exists(p)) return None
    val text = Files.readString(p, StandardCharsets.UTF_8)
    extractLong(text, "snapshot")
  }

  /** Read a specific snapshot (time travel), or the latest. */
  def read(spark: SparkSession, table: String,
      snapshot: Option[Long] = None): Option[DataFrame] = {
    val snap = snapshot.orElse(latestSnapshot(table)).getOrElse(return None)
    val dataPath = snapshotDir(table, snap).resolve("data")
    if (!Files.exists(dataPath)) return None
    Some(spark.read.parquet(dataPath.toString))
  }

  def manifest(table: String, snapshot: Long): Option[String] = {
    val p = snapshotDir(table, snapshot).resolve("manifest.json")
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def extractLong(json: String, key: String): Option[Long] = {
    val m = s""""$key"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(json)
    m.map(_.group(1).toLong)
  }
}
