package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** OKFN/Frictionless Data Package loader (reference:
  * `bubbles/datapackage.py` — reads `datapackage.json` resources as
  * store objects). The descriptor is a small driver-side JSON file; the
  * data itself is read as a fully distributed Spark scan with the
  * descriptor's Table Schema mapped to an explicit `StructType`, so no
  * inference pass touches the (potentially huge) resource files.
  *
  * Supported per the spec subset the reference handled: CSV resources
  * with `schema.fields[].{name,type}`, optional `dialect.delimiter` and
  * `dialect.header`; plus inline `data` resources (array-of-objects
  * keyed by field name, or array-of-arrays positional against the
  * schema, honoring `dialect.header` for the first row) — inline data
  * is descriptor-embedded and therefore driver-sized by definition.
  * Unknown field types degrade to string (the reference's behavior for
  * unknown storage types).
  */
object DataPackage {

  /** Frictionless Table Schema type -> Spark type. */
  private[sources] def sparkType(t: String): DataType = t match {
    case "integer"            => LongType
    case "number"             => DoubleType
    case "boolean"            => BooleanType
    case "date"               => DateType
    case "datetime" | "time"  => TimestampType
    case _                    => StringType // string, any, unknown
  }

  final case class Resource(
      name: String,
      path: String,
      schema: StructType,
      delimiter: String,
      header: Boolean,
      data: Option[Vector[JsonNode]] = None)

  private def parseResource(node: JsonNode): Resource = {
    val fields = node.path("schema").path("fields").elements().asScala.map { f =>
      StructField(f.path("name").asText(), sparkType(f.path("type").asText("string")))
    }.toArray
    val dialect = node.path("dialect")
    Resource(
      name = node.path("name").asText(),
      path = node.path("path").asText(),
      schema = StructType(fields),
      delimiter = Option(dialect.path("delimiter").asText(null)).getOrElse(","),
      header = dialect.path("header").asBoolean(true),
      data = if (node.has("data"))
        Some(node.path("data").elements().asScala.toVector) else None)
  }

  /** One JSON scalar -> the schema's external type (null-preserving;
    * date/datetime accept ISO forms). Non-coercible values THROW:
    * Jackson's asLong/asDouble default mismatches to 0, which would
    * silently zero garbage cells instead of surfacing the bad
    * descriptor. */
  private def convert(v: JsonNode, dt: DataType): Any =
    if (v == null || v.isNull) null
    else dt match {
      case LongType => if (v.isNumber) v.asLong() else v.asText().toLong
      case DoubleType => if (v.isNumber) v.asDouble() else v.asText().toDouble
      case BooleanType =>
        if (v.isBoolean) v.asBoolean() else v.asText().toBoolean
      case DateType => java.sql.Date.valueOf(v.asText())
      case TimestampType =>
        java.sql.Timestamp.valueOf(v.asText().replace("T", " "))
      case _ => v.asText()
    }

  /** Materialize an inline `data` resource. Array-of-objects rows are
    * keyed by field name; array-of-arrays rows are positional against
    * the schema (with the first row dropped when `dialect.header` holds,
    * exactly like the CSV path). A resource with inline data but no
    * Table Schema degrades to all-string columns in the first row's key
    * order — the same inference-free stance as the file path: the
    * descriptor IS the schema, we never guess types from values. */
  private[sources] def inlineFrame(
      spark: SparkSession, r: Resource, rows: Vector[JsonNode]): DataFrame = {
    val schema =
      if (r.schema.nonEmpty) r.schema
      else StructType(rows.headOption.filter(_.isObject).toSeq.flatMap(
        _.fieldNames.asScala.toSeq.map(StructField(_, StringType))))
    val body = rows.headOption match {
      case Some(h) if h.isArray && r.header => rows.drop(1)
      case _ => rows
    }
    val converted = body.map { n =>
      org.apache.spark.sql.Row.fromSeq(schema.fields.zipWithIndex.map {
        case (f, i) => convert(if (n.isArray) n.get(i) else n.get(f.name), f.dataType)
      }.toSeq)
    }
    spark.createDataFrame(converted.asJava, schema)
  }

  /** Parse `<dir>/datapackage.json` into resource descriptors. */
  def describe(dir: String): Seq[Resource] = {
    val json = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "datapackage.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val root = new ObjectMapper().readTree(json)
    root.path("resources").elements().asScala.map(parseResource).toSeq
  }

  /** Open a package directory as a read-only [[DataStore]]: one object per
    * resource, read with the descriptor schema (no inference pass). */
  def open(spark: SparkSession, dir: String): DataPackageStore =
    DataPackageStore(spark, dir, describe(dir))
}

/** Read-only store over a Data Package's resources (reference:
  * `bubbles/datapackage.py` resource-as-object semantics). */
final case class DataPackageStore(
    spark: SparkSession,
    dir: String,
    resources: Seq[DataPackage.Resource]) extends DataStore {
  private val byName = resources.map(r => r.name -> r).toMap
  def objectNames: Seq[String] = resources.map(_.name)
  def getObject(name: String): DataFrame = {
    val r = byName.getOrElse(name,
      throw new NoSuchElementException(s"no resource '$name' in package $dir"))
    r.data match {
      case Some(rows) => DataPackage.inlineFrame(spark, r, rows)
      case None =>
        spark.read
          .option("header", r.header)
          .option("sep", r.delimiter)
          .schema(r.schema)
          .csv(s"$dir/${r.path}")
    }
  }
  def create(name: String, from: DataFrame, replace: Boolean = false): Unit =
    throw new UnsupportedOperationException("data packages are read-only")
  def appendInto(name: String, rows: DataFrame): Unit =
    throw new UnsupportedOperationException("data packages are read-only")
}
