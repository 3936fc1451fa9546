package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared registration for the `graftdml` SQL catalog used by the DML-family
  * gates (s11/s14/s15/t10). Catalog options are frozen at FIRST use (Spark
  * caches catalog instances by name), so every gate must agree on one
  * warehouse path per JVM — a second conf.set with a different path would
  * be silently ignored. Gates DROP/recreate their own tables each run, so
  * the shared warehouse is safe across the multi-SF sweep. */
object DmlFixture {
  lazy val warehouse: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_dml_warehouse")
    p.toFile.deleteOnExit()
    p.toString
  }

  def register(s: SparkSession): Unit = {
    s.conf.set("spark.sql.catalog.graftdml",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graftdml.warehouse", warehouse)
    allowDefaults(s)
  }

  /** The first `n` long keys at/above `from` whose store bucket (xxhash64,
    * seed 42 — byte-for-byte [[graft.sources.GraftStore.bucketExpr]]) is
    * `bucket` under a `buckets` fan-out — fixture plumbing for gates that
    * need same-slot appends (fragmentation probes). */
  def keysForBucket(from: Long, buckets: Int, bucket: Int, n: Int): Seq[Long] =
    Iterator.iterate(from)(_ + 1).filter { k =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(k, org.apache.spark.sql.types.LongType, 42L)
      ((h % buckets) + buckets) % buckets == bucket
    }.take(n).toSeq

  /** `ALTER TABLE ... ADD COLUMNS (... DEFAULT ...)` is additionally
    * gated per PROVIDER by `spark.sql.defaultColumn.allowedProviders`
    * (the catalog capability alone only opens CREATE TABLE defaults) —
    * admit `graft` alongside the built-ins. */
  def allowDefaults(s: SparkSession): Unit = {
    val key = "spark.sql.defaultColumn.allowedProviders"
    val cur = s.conf.getOption(key).getOrElse("csv,json,orc,parquet")
    if (!cur.split(",").map(_.trim.toLowerCase).contains("graft"))
      s.conf.set(key, s"$cur,graft")
  }
}
