package graft.meta

import org.apache.spark.sql.types._

/** Column descriptor mirroring the reference's field metadata model
  * (reference: `bubbles/metadata.py::Field` — name, storage_type,
  * analytical_type, label, missing_values, info), re-expressed on top of
  * Spark's `StructField`. The logical storage type is a string name; the
  * concrete type is a Spark `DataType`. Analytical type, label and info are
  * carried in `StructField.metadata` so they survive through Catalyst.
  */
final case class Field(
    name: String,
    storageType: String = "unknown",
    analyticalType: String = "default",
    label: Option[String] = None,
    missingValues: Seq[String] = Nil,
    info: Map[String, String] = Map.empty,
    nullable: Boolean = true) {

  def dataType: DataType = Field.storageToDataType(storageType)

  def toStructField: StructField = {
    val mb = new MetadataBuilder()
      .putString(Field.StorageTypeKey, storageType)
      .putString(Field.AnalyticalTypeKey, analyticalType)
    label.foreach(mb.putString(Field.LabelKey, _))
    if (missingValues.nonEmpty)
      mb.putStringArray(Field.MissingValuesKey, missingValues.toArray)
    info.foreach { case (k, v) => mb.putString(s"info.$k", v) }
    StructField(name, dataType, nullable, mb.build())
  }
}

object Field {
  val StorageTypeKey = "graft.storage_type"
  val AnalyticalTypeKey = "graft.analytical_type"
  val LabelKey = "graft.label"
  val MissingValuesKey = "graft.missing_values"

  /** Analytical types from the reference (`bubbles/metadata.py`): pure
    * metadata consumed by aggregate/audit, not by execution. */
  val analyticalTypes: Set[String] =
    Set("default", "typeless", "flag", "discrete", "measure", "nominal", "ordinal")

  /** Logical storage-type name -> Spark DataType. `object` (opaque Python
    * value) has no distributed-safe analog and is rejected; `time` is kept
    * as a string (documented in SURVEY.md §1.2). */
  def storageToDataType(st: String): DataType = st match {
    case "string" | "text" | "time" => StringType
    case "integer"                  => LongType
    case "float" | "number"         => DoubleType
    case "boolean"                  => BooleanType
    case "date"                     => DateType
    case "datetime"                 => TimestampType
    case "binary"                   => BinaryType
    case "geopoint" =>
      StructType(Seq(StructField("lat", DoubleType), StructField("lon", DoubleType)))
    case "array"    => ArrayType(StringType)
    case "document" => MapType(StringType, StringType)
    case "unknown" =>
      throw new IllegalArgumentException(
        "storage type 'unknown' must be resolved before binding to a schema")
    case "object" =>
      throw new IllegalArgumentException(
        "storage type 'object' (opaque host value) is not supported on Spark")
    case other =>
      throw new IllegalArgumentException(s"unknown storage type: $other")
  }

  def dataTypeToStorage(dt: DataType): String = dt match {
    case StringType                      => "string"
    case _: IntegerType | _: LongType    => "integer"
    case _: ShortType | _: ByteType      => "integer"
    case _: FloatType | _: DoubleType    => "float"
    case _: DecimalType                  => "number"
    case BooleanType                     => "boolean"
    case DateType                        => "date"
    case _: TimestampType                => "datetime"
    case TimestampNTZType                => "datetime"
    case BinaryType                      => "binary"
    case _: ArrayType                    => "array"
    case _: MapType | _: StructType      => "document"
    case _                               => "unknown"
  }

  def fromStructField(sf: StructField): Field = {
    val m = sf.metadata
    def opt(key: String): Option[String] =
      if (m.contains(key)) Some(m.getString(key)) else None
    // recover info.* annotations (Metadata exposes no key enumeration,
    // so go through its canonical JSON form) — without this the
    // toStructField/fromStructField round trip silently drops info
    val info: Map[String, String] =
      org.json4s.jackson.JsonMethods.parse(m.json) match {
        case org.json4s.JObject(fields) => fields.collect {
          case (k, org.json4s.JString(v)) if k.startsWith("info.") =>
            k.stripPrefix("info.") -> v
        }.toMap
        case _ => Map.empty
      }
    Field(
      name = sf.name,
      storageType = opt(StorageTypeKey).getOrElse(dataTypeToStorage(sf.dataType)),
      analyticalType = opt(AnalyticalTypeKey).getOrElse("default"),
      label = opt(LabelKey),
      missingValues =
        if (m.contains(MissingValuesKey)) m.getStringArray(MissingValuesKey).toSeq else Nil,
      info = info,
      nullable = sf.nullable)
  }

  /** Tag a DataFrame column with an analytical type in its
    * `StructField.metadata` (preserving existing metadata) — the hook
    * that lets metadata-driven operators
    * ([[graft.ops.Ops.aggregateMeasures]]) find measures/dimensions. */
  def tag(df: org.apache.spark.sql.DataFrame, column: String,
      analyticalType: String): org.apache.spark.sql.DataFrame = {
    require(analyticalTypes.contains(analyticalType),
      s"unknown analytical type: $analyticalType")
    val existing = df.schema(column).metadata
    val md = new MetadataBuilder().withMetadata(existing)
      .putString(AnalyticalTypeKey, analyticalType).build()
    df.withColumn(column, df.col(column).as(column, md))
  }

  /** Columns of `df` tagged with the given analytical type. */
  def taggedAs(df: org.apache.spark.sql.DataFrame, analyticalType: String): Seq[String] =
    df.schema.fields.filter(f =>
      f.metadata.contains(AnalyticalTypeKey) &&
        f.metadata.getString(AnalyticalTypeKey) == analyticalType)
      .map(_.name).toSeq

  /** Shorthand coercion mirroring the reference's `to_field`: a bare name
    * (unknown-typed until bound), a `(name, storage_type)` pair, or a full
    * Field. */
  def toField(spec: Any): Field = spec match {
    case f: Field            => f
    case name: String        => Field(name, "string")
    case (n: String, st: String) => Field(n, st)
    case (n: String, st: String, at: String) => Field(n, st, at)
    case other =>
      throw new IllegalArgumentException(s"cannot coerce to Field: $other")
  }
}

/** Ordered schema (reference: `bubbles/metadata.py::FieldList`): thin,
  * order-preserving wrapper with the reference's lookup/concat surface,
  * convertible to/from `StructType`. */
final case class FieldList(fields: Seq[Field]) {
  def names: Seq[String] = fields.map(_.name)
  def field(name: String): Field =
    fields.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"no field named '$name'"))
  def index(name: String): Int = {
    val i = fields.indexWhere(_.name == name)
    if (i < 0) throw new NoSuchElementException(s"no field named '$name'") else i
  }
  def contains(name: String): Boolean = fields.exists(_.name == name)
  /** Boolean selector aligned with field order (reference: FieldList.mask). */
  def mask(selected: Seq[String]): Seq[Boolean] = fields.map(f => selected.contains(f.name))
  def ++(other: FieldList): FieldList = FieldList(fields ++ other.fields)
  def toStructType: StructType = StructType(fields.map(_.toStructField))
}

object FieldList {
  def apply(specs: Any*)(implicit d: DummyImplicit): FieldList =
    FieldList(specs.map(Field.toField))
  def fromStructType(st: StructType): FieldList =
    FieldList(st.fields.toSeq.map(Field.fromStructField))
}
