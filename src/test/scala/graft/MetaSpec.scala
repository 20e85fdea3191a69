package graft

import org.apache.spark.sql.types._
import graft.meta.{Field, FieldList, FieldFilter}

class MetaSpec extends SparkSpec {
  import spark.implicits._

  test("Field storage types map to Spark DataTypes") {
    assert(Field("a", "string").dataType == StringType)
    assert(Field("a", "integer").dataType == LongType)
    assert(Field("a", "number").dataType == DoubleType)
    assert(Field("a", "datetime").dataType == TimestampType)
    assert(Field("a", "geopoint").dataType.isInstanceOf[StructType])
    intercept[IllegalArgumentException](Field("a", "object").dataType)
    intercept[IllegalArgumentException](Field("a", "unknown").dataType)
  }

  test("Field metadata round-trips through StructField") {
    val f = Field("amt", "float", "measure", label = Some("Amount"),
      missingValues = Seq("N/A"),
      info = Map("source" -> "crm", "owner" -> "ops"))
    val back = Field.fromStructField(f.toStructField)
    assert(back.storageType == "float")
    assert(back.analyticalType == "measure")
    assert(back.label.contains("Amount"))
    assert(back.missingValues == Seq("N/A"))
    assert(back.info == Map("source" -> "crm", "owner" -> "ops"))
  }

  test("FieldList lookup, index, mask and concatenation") {
    val fl = FieldList(Seq(Field("a", "string"), Field("b", "integer")))
    assert(fl.names == Seq("a", "b"))
    assert(fl.index("b") == 1)
    assert(fl.field("a").storageType == "string")
    assert(fl.mask(Seq("b")) == Seq(false, true))
    assert((fl ++ FieldList(Seq(Field("c", "float")))).names == Seq("a", "b", "c"))
    intercept[NoSuchElementException](fl.field("zzz"))
  }

  test("toField coerces shorthand") {
    assert(Field.toField("name").storageType == "string")
    assert(Field.toField(("n", "integer")).storageType == "integer")
    assert(Field.toField(("n", "float", "measure")).analyticalType == "measure")
  }

  test("FieldFilter filters metadata and DataFrames consistently") {
    val fl = FieldList(Seq(Field("a", "string"), Field("b", "integer"),
      Field("c", "float")))
    val ff = FieldFilter(keep = Seq("a", "b"), rename = Map("b" -> "bee"))
    assert(ff.filter(fl).names == Seq("a", "bee"))
    val df = Seq(("x", 1L, 2.0)).toDF("a", "b", "c")
    assert(ff(df).columns.toSeq == Seq("a", "bee"))
    intercept[IllegalArgumentException](
      FieldFilter(keep = Seq("a"), drop = Seq("a"))(df))
  }
}
