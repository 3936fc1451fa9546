package graft

import java.nio.file.Files

import graft.sources.{GraftStore, GraftTableMeta}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CloneLinkSpec extends SparkTestBase {
  test("clone links resolved files; inodes match by name") {
    import spark.implicits._
    val root = Files.createTempDirectory("clone_dbg").toString
    val dir = s"$root/src"
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = true)))
    GraftStore.create(dir, GraftTableMeta(schema, Seq("k"), 4))
    GraftStore.applyChanges(spark, dir,
      spark.range(0, 40).select($"id".as("k"), ($"id" * 2).as("v"))
        .withColumn(GraftStore.OpCol, lit("I")), allInserts = true)
    GraftStore.applyChanges(spark, dir,
      Seq((3L, 999L)).toDF("k", "v").withColumn(GraftStore.OpCol, lit("U")))
    assert(GraftStore.currentVersion(dir) === 2L)
    val dst = s"$root/dst"
    GraftStore.cloneTable(dir, dst)
    def rel(p: java.nio.file.Path) =
      s"${p.getParent.getFileName}/${p.getFileName}"
    val srcByName = GraftStore.snapshotFiles(dir, 2L)
      .map(java.nio.file.Paths.get(_)).map(p => rel(p) -> p).toMap
    def key(p: java.nio.file.Path) = Files.readAttributes(p,
      classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
    val dstV = java.nio.file.Paths.get(GraftStore.versionDir(dst, 2L))
    import scala.jdk.CollectionConverters._
    val st = Files.walk(dstV)
    val probe = try st.iterator().asScala.filter(p =>
        Files.isRegularFile(p) &&
        p.getFileName.toString.startsWith("part-")).toList
      finally st.close()
    println(s"DBG probe=${probe.size} srcByName=${srcByName.size}")
    probe.take(3).foreach(p => println(s"DBG dst=$p twin=${srcByName.get(rel(p))}"))
    assert(probe.nonEmpty)
    probe.foreach { p =>
      val twin = srcByName.get(rel(p))
      assert(twin.isDefined, s"no twin for $p")
      assert(key(p) == key(twin.get), s"inode mismatch for $p")
    }
    // contents equal
    assert(GraftStore.readVersion(spark, dst, 2L).count() === 40L)
  }
}
