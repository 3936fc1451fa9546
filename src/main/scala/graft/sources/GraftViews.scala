package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}

/** Persistence for the catalog's SQL views (S38): one JSON file per view
  * under `<warehouse>/_views/`, holding exactly what Spark's view
  * resolution needs to re-analyze the text later under the DEFINER's
  * context — the SQL, the catalog + namespace it was written against
  * (so unqualified names in the text keep meaning what they meant at
  * CREATE time), the analyzed schema, query column names / aliases /
  * comments, and properties. Creation is create-exclusive (two racing
  * CREATE VIEWs serialize on the filesystem, the loser fails loudly);
  * replacement is a write-to-temp + atomic rename, so readers only ever
  * observe a complete definition. Views are metadata only — dropping or
  * replacing one never touches any table data. */
private[sources] object GraftViewStore {
  private val mapper = new ObjectMapper()

  /** A loaded view definition. */
  final case class Stored(sql: String, currentCatalog: String,
      currentNamespace: Array[String], schema: StructType,
      queryColumnNames: Array[String], columnAliases: Array[String],
      columnComments: Array[String], properties: Map[String, String])

  def write(path: Path, info: ViewInfo, createNew: Boolean): Unit = {
    val root = mapper.createObjectNode()
    root.put("sql", info.sql())
    root.put("currentCatalog", info.currentCatalog())
    locally {
      val a = root.putArray("currentNamespace")
      Option(info.currentNamespace()).getOrElse(Array.empty).foreach(a.add)
    }
    root.put("schema", info.schema().json)
    def arr(key: String, vs: Array[String]): Unit = {
      val a = root.putArray(key)
      Option(vs).getOrElse(Array.empty[String]).foreach {
        case null => a.addNull()
        case v => a.add(v)
      }
    }
    arr("queryColumnNames", info.queryColumnNames())
    arr("columnAliases", info.columnAliases())
    arr("columnComments", info.columnComments())
    locally {
      val p = root.putObject("properties")
      Option(info.properties()).foreach(_.forEach((k, v) => p.put(k, v)))
    }
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root)
    Files.createDirectories(path.getParent)
    if (createNew) {
      try Files.write(path, bytes, StandardOpenOption.CREATE_NEW)
      catch {
        case _: FileAlreadyExistsException =>
          throw new ViewAlreadyExistsException(Identifier.of(
            Array.empty[String],
            path.getFileName.toString.stripSuffix(".json")))
      }
    } else {
      val tmp = path.resolveSibling(s".${path.getFileName}.tmp-${System.nanoTime()}")
      Files.write(tmp, bytes)
      Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
  }

  def writeStored(path: Path, s: Stored): Unit = {
    val root = mapper.createObjectNode()
    root.put("sql", s.sql)
    root.put("currentCatalog", s.currentCatalog)
    locally {
      val a = root.putArray("currentNamespace"); s.currentNamespace.foreach(a.add)
    }
    root.put("schema", s.schema.json)
    def arr(key: String, vs: Array[String]): Unit = {
      val a = root.putArray(key)
      vs.foreach { case null => a.addNull(); case v => a.add(v) }
    }
    arr("queryColumnNames", s.queryColumnNames)
    arr("columnAliases", s.columnAliases)
    arr("columnComments", s.columnComments)
    locally {
      val p = root.putObject("properties")
      s.properties.foreach { case (k, v) => p.put(k, v) }
    }
    val tmp = path.resolveSibling(s".${path.getFileName}.tmp-${System.nanoTime()}")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def read(path: Path): Stored = {
    val root = mapper.readTree(Files.readAllBytes(path))
    def arr(key: String): Array[String] =
      root.get(key).elements().asScala
        .map(n => if (n.isNull) null else n.asText()).toArray
    Stored(
      sql = root.get("sql").asText(),
      currentCatalog = root.get("currentCatalog").asText(),
      currentNamespace = arr("currentNamespace"),
      schema = DataType.fromJson(root.get("schema").asText())
        .asInstanceOf[StructType],
      queryColumnNames = arr("queryColumnNames"),
      columnAliases = arr("columnAliases"),
      columnComments = arr("columnComments"),
      properties = root.get("properties").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
  }
}

/** DSv2 [[View]] served back to Spark's view resolution. */
private[sources] final class GraftView(viewName: String,
    s: GraftViewStore.Stored) extends View {
  override def name(): String = viewName
  override def query(): String = s.sql
  override def currentCatalog(): String = s.currentCatalog
  override def currentNamespace(): Array[String] = s.currentNamespace
  override def schema(): StructType = s.schema
  override def queryColumnNames(): Array[String] = s.queryColumnNames
  override def columnAliases(): Array[String] = s.columnAliases
  override def columnComments(): Array[String] = s.columnComments
  override def properties(): java.util.Map[String, String] =
    s.properties.asJava
}
