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
  /** Remove all rows, keep the object + schema (reference:
    * `DataObject.truncate`). Default: overwrite with an empty frame of
    * the same schema. */
  def truncate(name: String): Unit =
    create(name, spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      getObject(name).schema), replace = true)
}

object ParquetStore {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}

  /** Morton/Z-curve key: bit b of key i lands at interleaved position
    * b·n + i, so sorting by the result visits key space in Z-order —
    * nearby (k1, k2, …) tuples stay nearby in the one-dimensional sort.
    * Pure long shift/mask expression tree, fully inside codegen. Keys
    * are taken modulo 2^bits (low bits verbatim); `bits · n` must fit a
    * signed long. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.size >= 2, "z-ordering needs at least two keys")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits ($bits) x keys (${cols.size}) must fit a signed long")
    cols.zipWithIndex.flatMap { case (c, i) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
          b * cols.size + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Hilbert-curve key for TWO keys — [[zValue]]'s better-locality
    * sibling: the Z-curve takes a full-diagonal jump every time a high
    * interleaved bit flips (cell 2^{2k}−1 → 2^{2k} teleports across the
    * quadrant boundary), so a run of consecutive Z values can span a
    * wide rectangle; the Hilbert curve visits EVERY consecutive cell
    * pair at Manhattan distance exactly 1 (spec-pinned), so equal-count
    * file cuts cover tighter rectangles and min/max stats prune harder
    * on both keys. The classic per-level fold (quadrant digit
    * d += s²·((3·rx)⊕ry), then reflect-and-swap) as the NATIVE kernel
    * [[graft.functions.HilbertIndex]] — an iterative loop in both the
    * interpreted and generated paths; a Column-level unrolling
    * duplicates (x, y) per level and the tree grows 2^bits (measured:
    * codegen OOM at bits = 6). Keys are taken modulo 2^bits (low bits
    * verbatim); rank- or bucket-normalize skewed keys first, as
    * with Z. */
  def hilbertValue(c1: Column, c2: Column, bits: Int = 16): Column =
    org.apache.spark.sql.graft.Bridge.column(graft.functions.HilbertIndex(
      org.apache.spark.sql.graft.Bridge.expression(c1.cast("long")),
      org.apache.spark.sql.graft.Bridge.expression(c2.cast("long")), bits))
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
  /** Hive-style partitioned layout (`<name>.parquet/<col>=<val>/…`):
    * filters on the partition columns prune whole directories at plan
    * time (the scan's `PartitionFilters` — asserted in StoresSpec), the
    * primary data-skipping lever for append-heavy fact tables. Choose
    * low-cardinality columns; a high-cardinality partition key explodes
    * the file count and kills the driver's file listing at scale. */
  def createPartitioned(
      name: String,
      from: DataFrame,
      partitionCols: Seq[String],
      replace: Boolean = false): Unit =
    from.write.mode(if (replace) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .partitionBy(partitionCols: _*).parquet(path(name))
  /** Range-clustered layout: `repartitionByRange` + `sortWithinPartitions`
    * on the cluster columns before the write, so each output file covers
    * a disjoint key range and rows are sorted inside it. Parquet then
    * records tight min/max stats per file and row group, and any range or
    * point predicate on the cluster key skips everything else at read
    * time — the data-skipping lever for HIGH-cardinality keys, where
    * Hive partitioning ([[createPartitioned]]) would explode the file
    * count. `numFiles` sizes the layout (aim for ~128 MB-1 GB files at
    * scale); range boundaries come from Spark's reservoir sample of the
    * key distribution, so skewed keys still yield balanced files. */
  def createClustered(
      name: String,
      from: DataFrame,
      clusterCols: Seq[String],
      numFiles: Int,
      replace: Boolean = false): Unit =
    from.repartitionByRange(numFiles, clusterCols.map(from.col): _*)
      .sortWithinPartitions(clusterCols.map(from.col): _*)
      .write.mode(if (replace) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .parquet(path(name))

  /** Per-FILE column statistics manifest over a stored object — the
    * data-skipping observability pass (the stats half of a Delta/
    * Iceberg manifest, as a plain query): for every physical file,
    * row count plus min/max of the requested columns via the
    * `_metadata.file_path` hidden column, one scan + one
    * |files|-sized aggregation. Read it to SEE what a predicate can
    * skip: a [[createClustered]]/[[createZOrdered]] layout shows
    * disjoint (or rectangle-tight) ranges per file, an unsorted write
    * shows every file spanning the whole domain — the before/after
    * evidence for choosing a layout (spec-asserted on both). */
  def statsManifest(name: String, columns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, min, max}
    require(columns.nonEmpty, "at least one column required")
    val aggs = columns.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))) :+
      count(lit(1)).as("n_rows")
    getObject(name)
      .select(col("_metadata.file_path").as("file") +: columns.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Z-order (Morton-curve) clustered layout — multi-key row-group
    * skipping where [[createClustered]] only serves its LEADING key:
    * rows are range-partitioned and sorted by the bit-INTERLEAVED key
    * [[ParquetStore.zValue]], so each output file covers a small
    * rectangle in key space and parquet min/max stats prune scans
    * filtered on ANY of the keys (a lexicographic sort leaves every
    * non-leading key spanning the full range in most files). The Delta/
    * Iceberg `OPTIMIZE ZORDER BY` capability, expressed as a plain
    * write-side layout.
    *
    * Keys must be non-negative integers that fit `bits` bits — the
    * interleave takes each key's LOW `bits` bits verbatim. Rank- or
    * bucket-normalize skewed/continuous keys first (percentiles, epoch
    * days, …); normalization choice is domain knowledge the store
    * cannot guess, so it stays with the caller. */
  def createZOrdered(
      name: String,
      from: DataFrame,
      zCols: Seq[String],
      numFiles: Int,
      bits: Int = 16,
      replace: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.col
    val z = ParquetStore.zValue(zCols.map(from.col), bits)
    from.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(if (replace) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .parquet(path(name))
  }

  /** Hilbert-curve clustered layout — [[createZOrdered]] with the
    * better-locality key ([[ParquetStore.hilbertValue]]): consecutive
    * curve cells are always grid-adjacent, so equal-count file cuts
    * cover tighter rectangles than Z's quadrant-jump runs and min/max
    * stats prune harder on both keys. Two keys (the Hilbert rotation
    * is 2-D; for 3+ keys use [[createZOrdered]]); same low-`bits`
    * normalization contract. */
  def createHilbertOrdered(
      name: String,
      from: DataFrame,
      k1: String, k2: String,
      numFiles: Int,
      bits: Int = 16,
      replace: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.col
    val h = ParquetStore.hilbertValue(from.col(k1), from.col(k2), bits)
    from.withColumn("__h", h)
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode(if (replace) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .parquet(path(name))
  }

  /** Bounded-shard layout for training-data export: no output file
    * exceeds `maxRecordsPerShard` rows (Spark rolls a new file when a
    * task hits the bound), and rows are laid out in `orderBy` order
    * within each shard when given — the "fixed-size shards a trainer's
    * data loader can schedule uniformly" contract. Row-count, not byte,
    * bounded: pick the bound from the corpus' rows-per-target-shard-size
    * (bytes-per-row × bound ≈ shard bytes). `numShards` presizes the
    * parallel write; tasks above the record bound split into multiple
    * files, so the bound holds regardless. */
  def createSharded(
      name: String,
      from: DataFrame,
      maxRecordsPerShard: Long,
      numShards: Int,
      orderBy: Seq[String] = Nil,
      replace: Boolean = false): Unit = {
    require(maxRecordsPerShard > 0, "maxRecordsPerShard must be positive")
    require(numShards > 0, "numShards must be positive")
    val laid =
      if (orderBy.isEmpty) from.repartition(numShards)
      else from.repartitionByRange(numShards, orderBy.map(from.col): _*)
        .sortWithinPartitions(orderBy.map(from.col): _*)
    laid.write
      .option("maxRecordsPerFile", maxRecordsPerShard)
      .mode(if (replace) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .parquet(path(name))
  }

  /** Append into a Hive-partitioned layout ([[createPartitioned]]):
    * new rows land under their partition directories, existing
    * partitions gain files, new partition values gain directories —
    * the write path of an append-heavy partitioned index/fact table.
    * Pair with [[compact]] when the per-partition file count grows. */
  def appendPartitioned(
      name: String, rows: DataFrame, partitionCols: Seq[String]): Unit =
    rows.write.mode(SaveMode.Append)
      .partitionBy(partitionCols: _*).parquet(path(name))

  /** Rewrite an object's files into a compact layout — the maintenance
    * pass every append-heavy loop needs: each [[appendInto]] /
    * [[appendPartitioned]] adds task-count files, and a year of
    * hourly batches is tens of thousands of tiny files whose listing
    * and per-file open dominate scan cost long before the bytes do.
    * Rewrites to `numFiles` outputs (partitioned layouts: one file
    * per partition per task — pass the partition columns so the
    * directory layout and its pruning survive). Rows are bit-identical
    * (spec-pinned). The swap is write-aside then two directory
    * renames: a crash leaves the old or the new layout whole on disk
    * (plus at worst a leftover `__old`/`__compacting` dir), never a
    * partial mix — rename-based swap, not an in-place rewrite. */
  def compact(
      name: String, numFiles: Int = 1,
      partitionCols: Seq[String] = Nil): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    val df = getObject(name)
    val tmp = s"${name}__compacting"
    val laid =
      if (partitionCols.isEmpty) df.repartition(numFiles)
      else df.repartition(partitionCols.map(df.col): _*)
    val writer = laid.write.mode(SaveMode.Overwrite)
    (if (partitionCols.isEmpty) writer
     else writer.partitionBy(partitionCols: _*)).parquet(path(tmp))
    import scala.reflect.io.Directory
    val oldDir = new java.io.File(path(s"${name}__old"))
    new Directory(oldDir).deleteRecursively() // stale leftover, if any
    require(new java.io.File(path(name)).renameTo(oldDir),
      s"compact: could not move ${path(name)} aside")
    require(new java.io.File(path(tmp)).renameTo(new java.io.File(path(name))),
      s"compact: rename of ${path(tmp)} failed")
    new Directory(oldDir).deleteRecursively(); ()
  }
}

/** Directory of ORC files, one object per `<name>.orc` — the other
  * columnar lake format Spark executes natively (same predicate
  * pushdown, column pruning, and vectorized read path as parquet; choose
  * it when the surrounding ecosystem is Hive/ORC-based). */
final case class OrcStore(spark: SparkSession, dir: String) extends DataStore {
  private def path(name: String) = s"$dir/$name.orc"
  def objectNames: Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).map(_.toSeq).getOrElse(Nil)
      .filter(_.endsWith(".orc")).map(_.stripSuffix(".orc")).sorted
  }
  override def exists(name: String): Boolean = new java.io.File(path(name)).exists()
  def getObject(name: String): DataFrame = spark.read.orc(path(name))
  def create(name: String, from: DataFrame, replace: Boolean = false): Unit =
    from.write.mode(if (replace) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .orc(path(name))
  def appendInto(name: String, rows: DataFrame): Unit =
    rows.write.mode(SaveMode.Append).orc(path(name))
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
  /** With a header row the trait default (overwrite empty) keeps the
    * column NAMES (types re-infer as string until rows return — inherent
    * to CSV, same caveat as any inference read). Headerless CSV has
    * nowhere to keep the schema at all, so truncate would leave an
    * object whose next read has no columns — refuse, like JsonStore. */
  override def truncate(name: String): Unit = {
    if (!header) throw new UnsupportedOperationException(
      "truncate on a headerless CSV store would lose the schema entirely " +
        "(no header row to rewrite); create(replace = true) instead")
    super.truncate(name)
  }
}

/** Directory of JSON-lines objects — the third text format next to CSV.
  * Unlike CSV's header row, bare JSON lines carry no schema: a
  * schema-less read always pays an inference pass (use the
  * explicit-schema [[getObject(name:String,schema*]] overload at scale),
  * and [[truncate]] is unsupported because zero data lines leave nothing
  * to infer a schema from. */
final case class JsonStore(
    spark: SparkSession,
    dir: String) extends DataStore {
  private def path(name: String) = s"$dir/$name.json"
  def objectNames: Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).map(_.toSeq).getOrElse(Nil)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted
  }
  override def exists(name: String): Boolean = new java.io.File(path(name)).exists()
  def getObject(name: String): DataFrame = spark.read.json(path(name))
  def getObject(name: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path(name))
  def create(name: String, from: DataFrame, replace: Boolean = false): Unit =
    from.write.mode(if (replace) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .json(path(name))
  def appendInto(name: String, rows: DataFrame): Unit =
    rows.write.mode(SaveMode.Append).json(path(name))
  override def truncate(name: String): Unit =
    throw new UnsupportedOperationException(
      "JSON-lines carries no schema; a truncated object would be " +
        "unreadable. Overwrite with create(name, emptyDf, replace = true) " +
        "and re-read with the explicit-schema getObject instead.")
}

/** The Spark session catalog as a store (reference: the SQL backend,
  * `bubbles/backends/sql/objects.py::SQLDataStore`, when the "database"
  * is Spark's own catalog). The reference's lazily composed `SQLStatement`
  * objects are exactly Catalyst logical plans here, so `sql()` returns a
  * composable DataFrame. For an external RDBMS use [[JdbcStore]]. */
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
  /** Catalog-native TRUNCATE — preserves table metadata (bucketing,
    * partitioning) the trait default's overwrite would discard. */
  override def truncate(name: String): Unit =
    spark.sql(s"TRUNCATE TABLE $name")
  /** Bucketed + sorted table: joins and aggregations on the bucket keys
    * between co-bucketed tables plan with NO shuffle (asserted in
    * StoresSpec) — the static co-location strategy for fact-fact joins
    * repeated across many queries, where paying one bucketed write
    * amortizes every later shuffle. Bucket count should be sized so one
    * bucket ≈ one task's worth of data at the target scale. */
  def createBucketed(
      name: String,
      from: DataFrame,
      bucketKeys: Seq[String],
      numBuckets: Int,
      replace: Boolean = false): Unit =
    from.write.mode(if (replace) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .bucketBy(numBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .saveAsTable(name)
}

/** External RDBMS store over JDBC — the reference's primary backend
  * (`bubbles/backends/sql/objects.py::SQLDataStore`, SQLAlchemy engine ↔
  * JDBC url + properties here).
  *
  *  - [[getObject]] plans a JDBC scan; Catalyst pushes filters and column
  *    pruning into the generated database query.
  *  - A plain JDBC scan is ONE task no matter the cluster size, so the
  *    partitioned overload (`partitionColumn`/bounds/`numPartitions`) is
  *    the only shape that scales: Spark issues `numPartitions` range
  *    predicates in parallel. Always use it for tables beyond a few
  *    hundred MB.
  *  - [[statement]] is the reference's `SQLStatement`: a SELECT pushed to
  *    the database as a subquery, still lazily composable on the Spark
  *    side.
  *  - Writes go through `df.write.jdbc`; `batchsize` in `properties`
  *    controls insert batching.
  */
final case class JdbcStore(
    spark: SparkSession,
    url: String,
    properties: java.util.Properties = new java.util.Properties)
  extends DataStore {
  def objectNames: Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url, properties)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val names = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("TABLE_NAME")).toList
      names.sorted
    } finally conn.close()
  }
  def getObject(name: String): DataFrame =
    spark.read.jdbc(url, name, properties)
  /** Parallel partitioned read — the scale path (see class doc). */
  def getObject(
      name: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(url, name, partitionColumn, lowerBound, upperBound,
      numPartitions, properties)
  /** Lazily composed SELECT executed by the database (reference:
    * `SQLStatement`). */
  def statement(sql: String): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url).option("query", sql)
    properties.stringPropertyNames().toArray(Array.empty[String])
      .foldLeft(reader)((r, k) => r.option(k, properties.getProperty(k)))
      .load()
  }
  def create(name: String, from: DataFrame, replace: Boolean = false): Unit =
    from.write.mode(if (replace) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .jdbc(url, name, properties)
  def appendInto(name: String, rows: DataFrame): Unit =
    rows.write.mode(SaveMode.Append).jdbc(url, name, properties)
  /** SQL TRUNCATE on the database — the trait default (overwrite with an
    * empty frame) would DROP and recreate the table, losing indexes,
    * constraints and DBA-defined column types. The object name is quoted
    * through Spark's dialect layer (it may come from untrusted config)
    * and the statement comes from the dialect's own truncate form;
    * dialects whose backend lacks TRUNCATE fall back to DELETE FROM,
    * which also keeps the table object intact. */
  override def truncate(name: String): Unit = {
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    val quoted = name.split('.').map(dialect.quoteIdentifier).mkString(".")
    val conn = java.sql.DriverManager.getConnection(url, properties)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(dialect.getTruncateQuery(quoted))
      catch {
        case truncateFailure: java.sql.SQLException =>
          val del = conn.createStatement()
          // if the fallback fails too (missing table, FK restriction,
          // permissions), surface BOTH causes rather than masking the
          // original TRUNCATE error with the second one
          try del.executeUpdate(s"DELETE FROM $quoted")
          catch {
            case deleteFailure: java.sql.SQLException =>
              deleteFailure.addSuppressed(truncateFailure)
              throw deleteFailure
          } finally del.close()
      } finally st.close()
    } finally conn.close()
  }
}

/** In-memory objects (reference: `bubbles/objects.py::RowListDataObject`,
  * which held MATERIALIZED rows). `create` snapshots the input via
  * `localCheckpoint` so a stored object is a completed copy, not a live
  * plan over its source — replacing or deleting the source afterwards
  * cannot change (or break) what was stored, matching the reference and
  * making [[Stores.copy]] into a memory target a real copy. */
final class MemoryStore(val spark: SparkSession) extends DataStore {
  private val objects = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
  def objectNames: Seq[String] = objects.keys.toSeq
  def getObject(name: String): DataFrame = objects(name)
  def create(name: String, from: DataFrame, replace: Boolean = false): Unit = {
    if (!replace && objects.contains(name))
      throw new IllegalStateException(s"object '$name' exists")
    objects(name) = from.localCheckpoint()
  }
  def appendInto(name: String, rows: DataFrame): Unit =
    objects(name) = objects.get(name)
      .map(_.unionByName(rows.localCheckpoint())).getOrElse(rows.localCheckpoint())
}

/** One-shot local sources (reference: `bubbles/objects.py::
  * {IterableDataSource, IterableRecordsDataSource, RowListDataObject}`):
  * wrap a driver-local iterator/collection + schema into a DataFrame.
  * The reference marked these *consumable* (single pass); Spark plans are
  * re-computable so consumability disappears — for genuinely one-pass
  * feeds use Structured Streaming (`graft.streaming`). Driver-local data
  * only: anything sizable belongs in a real distributed source. */
object LocalData {
  import org.apache.spark.sql.Row
  import scala.jdk.CollectionConverters._

  def fromRows(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  /** Iterator variant (`IterableDataSource`): drained once at plan
    * construction — the DataFrame is then re-computable. */
  def fromIterator(spark: SparkSession, it: Iterator[Row], schema: StructType): DataFrame =
    fromRows(spark, it.toSeq, schema)

  /** Records variant (`IterableRecordsDataSource`): name→value maps;
    * missing keys become NULLs, extra keys are ignored — the reference's
    * dict-row semantics. */
  def fromRecords(
      spark: SparkSession,
      records: Seq[Map[String, Any]],
      schema: StructType): DataFrame = {
    val names = schema.fieldNames.toSeq
    fromRows(spark, records.map(m => Row.fromSeq(names.map(m.getOrElse(_, null)))), schema)
  }
}

object Stores {
  /** Factory mirroring the reference's `open_store(type, ...)`. */
  def open(spark: SparkSession, storeType: String, location: String = ""): DataStore =
    storeType match {
      case "parquet" => ParquetStore(spark, location)
      case "orc"     => OrcStore(spark, location)
      case "csv"     => CsvStore(spark, location)
      case "json"    => JsonStore(spark, location)
      case "catalog" | "sql" => CatalogStore(spark)
      case "jdbc"    => JdbcStore(spark, location)
      case "xlsx"    => XlsxStore(spark, location)
      case "memory"  => new MemoryStore(spark)
      case other => throw new IllegalArgumentException(s"unknown store type: $other")
    }

  /** Store-to-store ETL (reference EP3: `create(..., from_obj=)` /
    * `append_from`): on Spark this is a fully distributed read → write
    * with no driver-side row loop, whatever the two backends are. */
  def copy(
      source: DataStore, from: String,
      target: DataStore, to: String,
      replace: Boolean = false): Unit =
    target.create(to, source.getObject(from), replace)
}
