package graft.meta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Declarative projection spec (reference: `bubbles/metadata.py::FieldFilter`
  * — keep/drop/rename). Compiles to a single `select` so Catalyst sees one
  * Project node and can prune the scan down to exactly the kept columns.
  */
final case class FieldFilter(
    keep: Seq[String] = Nil,
    drop: Seq[String] = Nil,
    rename: Map[String, String] = Map.empty) {

  /** Apply to a FieldList (metadata-level, mirrors reference semantics). */
  def filter(fl: FieldList): FieldList = {
    val kept =
      (if (keep.nonEmpty) keep.map(fl.field) else fl.fields).filterNot(f => drop.contains(f.name))
    FieldList(kept.map(f => f.copy(name = rename.getOrElse(f.name, f.name))))
  }

  /** Apply to a DataFrame as one Project. */
  def apply(df: DataFrame): DataFrame = {
    val base = if (keep.nonEmpty) keep else df.columns.toSeq
    val cols = base.filterNot(drop.contains)
    require(cols.nonEmpty, "FieldFilter would drop every column")
    df.select(cols.map(c => col(c).as(rename.getOrElse(c, c))): _*)
  }
}
