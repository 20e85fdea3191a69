package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Named-object catalogs (reference: `bubbles/stores.py::DataStore` with
  * `get_object` / `create` / `exists` / `object_names`, plus the
  * `open_store(type, ...)` factory). A store maps object names to
  * DataFrames; `create(..., from = ...)` is the reference's
  * store-to-store ETL path (`append_from`), which on Spark is a fully
  * distributed read -> write with no driver-side row loop.
  */
trait DataStore {
  def spark: SparkSession
  def objectNames: Seq[String]
  def exists(name: String): Boolean = objectNames.contains(name)
  def getObject(name: String): DataFrame
  def create(name: String, from: DataFrame, replace: Boolean = false): Unit
  def appendInto(name: String, rows: DataFrame): Unit
}

/** Directory of parquet files, one object per `<name>.parquet` — the
  * store this project's fixtures live in. Parquet gives columnar scans
  * with predicate pushdown and column pruning at any scale. */
final case class ParquetStore(spark: SparkSession, dir: String) extends DataStore {
  private def path(name: String) = s"$dir/$name.parquet"
  def objectNames: Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).map(_.toSeq).getOrElse(Nil)
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet")).sorted
  }
  override def exists(name: String): Boolean = new java.io.File(path(name)).exists()
  def getObject(name: String): DataFrame = spark.read.parquet(path(name))
  def create(name: String, from: DataFrame, replace: Boolean = false): Unit =
    from.write.mode(if (replace) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .parquet(path(name))
  def appendInto(name: String, rows: DataFrame): Unit =
    rows.write.mode(SaveMode.Append).parquet(path(name))
}

/** Directory of CSV objects (reference: the CSV source/target backend,
  * `bubbles/backends/text/objects.py::{CSVSource, CSVTarget}`), with the
  * reference's `infer_fields` flag mapped to Spark's schema inference.
  * Prefer an explicit schema at scale — inference costs an extra pass. */
final case class CsvStore(
    spark: SparkSession,
    dir: String,
    inferFields: Boolean = true,
    delimiter: String = ",",
    header: Boolean = true) extends DataStore {
  private def path(name: String) = s"$dir/$name.csv"
  def objectNames: Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).map(_.toSeq).getOrElse(Nil)
      .filter(_.endsWith(".csv")).map(_.stripSuffix(".csv")).sorted
  }
  override def exists(name: String): Boolean = new java.io.File(path(name)).exists()
  def getObject(name: String): DataFrame =
    spark.read.option("header", header).option("sep", delimiter)
      .option("inferSchema", inferFields).csv(path(name))
  def getObject(name: String, schema: StructType): DataFrame =
    spark.read.option("header", header).option("sep", delimiter)
      .schema(schema).csv(path(name))
  def create(name: String, from: DataFrame, replace: Boolean = false): Unit =
    from.write.mode(if (replace) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .option("header", header).option("sep", delimiter).csv(path(name))
  def appendInto(name: String, rows: DataFrame): Unit =
    rows.write.mode(SaveMode.Append).option("header", header)
      .option("sep", delimiter).csv(path(name))
}

/** The Spark session catalog as a store (reference: the SQL backend,
  * `bubbles/backends/sql/objects.py::SQLDataStore`). The reference's
  * lazily composed `SQLStatement` objects are exactly Catalyst logical
  * plans here, so `sql()` returns a composable DataFrame. JDBC variants of
  * get/create are exposed for external RDBMS parity. */
final case class CatalogStore(spark: SparkSession) extends DataStore {
  def objectNames: Seq[String] = spark.catalog.listTables().collect().map(_.name).toSeq.sorted
  override def exists(name: String): Boolean = spark.catalog.tableExists(name)
  def getObject(name: String): DataFrame = spark.table(name)
  def sql(statement: String): DataFrame = spark.sql(statement)
  def create(name: String, from: DataFrame, replace: Boolean = false): Unit =
    from.write.mode(if (replace) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .saveAsTable(name)
  def appendInto(name: String, rows: DataFrame): Unit =
    rows.write.mode(SaveMode.Append).saveAsTable(name)
}

/** In-memory objects (reference: `bubbles/objects.py::RowListDataObject` /
  * `IterableDataSource`). Spark DataFrames are re-computable, so the
  * reference's consumable/one-pass accounting disappears. */
final class MemoryStore(val spark: SparkSession) extends DataStore {
  private val objects = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
  def objectNames: Seq[String] = objects.keys.toSeq
  def getObject(name: String): DataFrame = objects(name)
  def create(name: String, from: DataFrame, replace: Boolean = false): Unit = {
    if (!replace && objects.contains(name))
      throw new IllegalStateException(s"object '$name' exists")
    objects(name) = from
  }
  def appendInto(name: String, rows: DataFrame): Unit =
    objects(name) = objects.get(name).map(_.unionByName(rows)).getOrElse(rows)
}

object Stores {
  /** Factory mirroring the reference's `open_store(type, ...)`. */
  def open(spark: SparkSession, storeType: String, location: String = ""): DataStore =
    storeType match {
      case "parquet" => ParquetStore(spark, location)
      case "csv"     => CsvStore(spark, location)
      case "catalog" | "sql" => CatalogStore(spark)
      case "memory"  => new MemoryStore(spark)
      case other => throw new IllegalArgumentException(s"unknown store type: $other")
    }
}
