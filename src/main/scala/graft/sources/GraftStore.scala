package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table metadata persisted next to the data: declared schema, the key
  * columns row-level operations identify rows by, and the fixed hash-bucket
  * fan-out the copy-on-write rewrite is scoped to. */
final case class GraftTableMeta(schema: StructType, keyCols: Seq[String], buckets: Int)

/** Versioned, hash-bucketed, copy-on-write parquet store backing the
  * [[GraftCatalog]] SQL DML surface (SURVEY §2.2 S9's `MERGE INTO` /
  * `UPDATE` / `DELETE` as SQL text — the reference's closest analogue is
  * the compacted key-value store its scheduler persists between ticks,
  * /root/reference/module/internal/misc/server/server.cpp:18-111, which
  * only ever sees whole-value upserts; SQL row-level DML is the missing
  * write surface this store adds).
  *
  * Layout (all hidden names start with `_` so file-listing scans and
  * partition discovery never see them):
  * {{{
  *   <dir>/_meta.json            schema + key columns + bucket count
  *   <dir>/_current              atomic pointer: current version number
  *   <dir>/v0000000007/          one immutable directory per version
  *     gbucket=<k>/part-*.parquet
  *   <dir>/_staging/<queryId>/   delta-write staging frames
  * }}}
  *
  * Commit = copy-on-write at BUCKET granularity: a change batch only
  * rewrites the buckets its keys hash into; untouched buckets are
  * hard-linked file-for-file into the new version directory (an object
  * store deployment would reference them from a manifest instead — same
  * commit protocol as [[graft.streaming.CompactingSink.snapshot]]). The
  * version pointer flips last with an atomic rename, so readers resolve a
  * complete version or the previous one, never a half-written directory.
  *
  * Scale shape: the rewrite job is `base buckets ⟕anti changes ∪ changes`
  * — one shuffle join keyed on the merge key, partitioned output, nothing
  * collected (the only driver-side materialization is the set of touched
  * bucket ids, ≤ `buckets` ints). At 100 TB you raise `buckets` so a
  * bucket is a few GB and a merge touching 1% of keys rewrites ~1% of
  * files.
  *
  * Single-writer: commits are not coordinated across concurrent writers
  * (the gate and tests are single-session); a multi-writer deployment
  * would CAS the pointer file the way CompactingSink's snapshot log does.
  */
object GraftStore {
  /** Reserved partition-column name for the bucket id. Must NOT start with
    * `_` or `.`: Hadoop's hidden-file filter would skip `_bucket=3`
    * directories during partition discovery and the table would read
    * empty. */
  val BucketCol = "gbucket"
  val OpCol = "_op"

  private def metaPath(dir: String): Path = Paths.get(dir, "_meta.json")
  private def pointerPath(dir: String): Path = Paths.get(dir, "_current")
  def versionDir(dir: String, v: Long): String = f"$dir/v$v%010d"
  def stagingDir(dir: String, id: String): String = s"$dir/_staging/$id"

  def exists(dir: String): Boolean = Files.exists(metaPath(dir))

  def writeMeta(dir: String, meta: GraftTableMeta): Unit = {
    Files.createDirectories(Paths.get(dir))
    // schema via StructType.json (public, round-trips NOT NULL); keys and
    // bucket count as adjacent lines — no JSON library needed to parse.
    val body = meta.schema.json + "\n" + meta.keyCols.mkString(",") + "\n" + meta.buckets
    Files.write(metaPath(dir), body.getBytes("UTF-8"))
  }

  def readMeta(dir: String): GraftTableMeta = {
    val lines = new String(Files.readAllBytes(metaPath(dir)), "UTF-8").split("\n")
    GraftTableMeta(DataType.fromJson(lines(0)).asInstanceOf[StructType],
      lines(1).split(",").toSeq.filter(_.nonEmpty), lines(2).trim.toInt)
  }

  def currentVersion(dir: String): Long =
    new String(Files.readAllBytes(pointerPath(dir)), "UTF-8").trim.toLong

  def listVersions(dir: String): Seq[Long] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.matches("v\\d{10}"))
      .map(_.drop(1).toLong).toSeq.sorted

  private def writePointer(dir: String, v: Long): Unit = {
    val tmp = Paths.get(dir, "_current.tmp")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, pointerPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Create an empty table: meta, empty v0, pointer. */
  def create(dir: String, meta: GraftTableMeta): Unit = {
    writeMeta(dir, meta)
    Files.createDirectories(Paths.get(versionDir(dir, 0L)))
    writePointer(dir, 0L)
  }

  /** New empty version (TRUNCATE / INSERT OVERWRITE's first half). */
  def truncate(dir: String): Unit = {
    val next = currentVersion(dir) + 1
    val nd = Paths.get(versionDir(dir, next))
    deleteRecursively(nd)
    Files.createDirectories(nd)
    writePointer(dir, next)
  }

  def dropTable(dir: String): Unit = deleteRecursively(Paths.get(dir))

  /** Keep the newest `keepLast` versions, delete older directories (the
    * pointer always stays within the kept set). */
  def expireVersions(dir: String, keepLast: Int): Unit = {
    val keep = listVersions(dir).takeRight(math.max(1, keepLast)).toSet
    listVersions(dir).filterNot(keep).foreach { v =>
      deleteRecursively(Paths.get(versionDir(dir, v)))
    }
  }

  def bucketExpr(keyCols: Seq[String], buckets: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(buckets.toLong)).cast(IntegerType)

  private def bucketDirs(vdir: String): Seq[Int] = {
    val p = Paths.get(vdir)
    if (!Files.isDirectory(p)) Seq.empty
    else Files.list(p).iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith(s"$BucketCol=")).map(_.split("=")(1).toInt).toSeq
  }

  /** Read one version as a DataFrame including the [[BucketCol]] partition
    * column (empty-but-typed when the version has no data yet). */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val meta = readMeta(dir)
    val vdir = versionDir(dir, v)
    val withBucket = StructType(meta.schema.fields :+
      StructField(BucketCol, IntegerType, nullable = true))
    if (bucketDirs(vdir).isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), withBucket)
    else spark.read.schema(withBucket).parquet(vdir)
  }

  /** Apply a change batch. `changes` columns: [[OpCol]] (one of I/U/D) plus
    * the full table schema (delete rows carry the key columns, the rest
    * null). Returns the committed version. */
  def applyChanges(spark: SparkSession, dir: String, changes: DataFrame): Long = {
    val meta = readMeta(dir)
    val cur = currentVersion(dir)
    val next = cur + 1
    val nextDir = versionDir(dir, next)
    deleteRecursively(Paths.get(nextDir)) // crash remnant from an unswitched commit

    val cols = meta.schema.fieldNames.toSeq
    val ch = changes.withColumn(BucketCol, bucketExpr(meta.keyCols, meta.buckets))
      .persist()
    try {
      // ≤ `buckets` distinct ints — the one driver-side materialization.
      val touched = ch.select(BucketCol).distinct().collect().map(_.getInt(0)).toSet
      val existing = bucketDirs(versionDir(dir, cur)).toSet
      val untouched = existing -- touched

      if (touched.nonEmpty) {
        val base = readVersion(spark, dir, cur)
          .filter(col(BucketCol).isin(touched.toSeq: _*))
        val removes = ch.filter(col(OpCol).isin("U", "D"))
          .select(meta.keyCols.map(col): _*).distinct()
        val adds = ch.filter(col(OpCol).isin("I", "U"))
          .select((cols :+ BucketCol).map(col): _*)
        val kept = base.join(removes, meta.keyCols, "left_anti")
          .select((cols :+ BucketCol).map(col): _*)
        kept.unionByName(adds)
          .write.partitionBy(BucketCol).parquet(nextDir)
      } else Files.createDirectories(Paths.get(nextDir))

      // Untouched buckets: hard-link files into the new version (an object
      // store would manifest-reference them; local FS links are free).
      untouched.foreach { b =>
        val src = Paths.get(versionDir(dir, cur), s"$BucketCol=$b")
        val dst = Paths.get(nextDir, s"$BucketCol=$b")
        Files.createDirectories(dst)
        Files.list(src).iterator().asScala
          .filter(f => Files.isRegularFile(f) && !f.getFileName.toString.startsWith("."))
          .foreach(f => Files.createLink(dst.resolve(f.getFileName), f))
      }
      writePointer(dir, next)
      next
    } finally ch.unpersist()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
    }
}
