package graft.storage

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.storage.GraftCatalog.{ColStat, RowCountKey}

/** Answers metadata-only aggregates — `min(x)` / `max(x)` / `count(*)` /
  * `count(x)` with no filter and no grouping — straight from the manifest's
  * per-file column stats, without opening a single parquet footer. At
  * warehouse scale this turns `SELECT max(event_date) FROM fact` over a
  * 100 TB table from a full metadata+footer walk into a driver-local fold
  * over lines the catalog already read: zero tasks, zero file opens
  * (the scan plans as a `LocalTableScan`).
  *
  * The answer is served through Spark's PARTIAL aggregate-pushdown
  * protocol (`SupportsPushDownAggregates` with
  * `supportCompletePushDown = false`): the scan returns ONE row of
  * per-source partial values `[min₁, max₂, count₃, …]` and Spark's final
  * aggregate folds it, so null semantics (empty table → null min) and the
  * final value both come out exactly as a full scan would produce.
  *
  * Strictly conservative — `None` (fall back to a real scan) unless EVERY
  * file in the scan's current file set has a manifest stats entry covering
  * every referenced column, because absence of stats must mean "unknown",
  * never "empty". Per-aggregate rules:
  *
  *  - `count(*)`: every file carries a recorded row count
  *    ([[GraftCatalog.RowCountKey]]); answer = Σ rows.
  *  - `count(x)`: additionally every file's null count for `x` is known
  *    (≥ 0 — a writer-omitted count is recorded as −1 and bails);
  *    answer = Σ (rows − nulls).
  *  - `min(x)` / `max(x)`: every file has stats for `x` whose kind matches
  *    the column's Spark type; all-null files (kind "n") contribute
  *    nothing. Strings combine in unsigned UTF-8 byte order (the order the
  *    footers were computed in), numerics as exact BigDecimal. Floating
  *    answers whose winning bound is zero bail: the decimal stat string
  *    cannot distinguish `-0.0` from `0.0`, and min/max must return the
  *    exact sign a full scan would.
  *
  * Count answers rely on row/null counts, which parquet footers record
  * exactly; min/max additionally relies on the footer bounds being the
  * exact extreme VALUES, which holds for files this catalog wrote
  * (parquet-mr's default statistics truncation length is unlimited) —
  * [[GraftCatalog.footerStats]] only ever reads this catalog's own
  * commits. NaN never corrupts a bound: parquet-mr SCRUBS a float/double
  * row group's min/max when the group contains NaN, and footerStats
  * records such files under the bounds-unknown kind "u" (null count only)
  * rather than letting the surviving groups claim a too-narrow range — so
  * a column containing NaN always falls back to a real scan here (`bound`
  * accepts kinds matching the column or "n" only).
  */
object ManifestAggregates {

  /** The scan-side schema+row for an UNGROUPED `agg` if every aggregate is
    * answerable from `stats` over exactly `files`; None = plan a real
    * scan. */
  def tryAnswer(
      schema: StructType,
      files: Seq[String],
      stats: Map[String, Map[String, ColStat]],
      agg: Aggregation): Option[(StructType, InternalRow)] =
    if (agg.groupByExpressions.nonEmpty) None
    else tryAnswerGrouped(schema, Seq.empty, Seq(Seq.empty -> files), stats, agg)
      .map { case (st, rows) => st -> rows.head }

  /** Grouped answering — the caller has already resolved the GROUP BY to
    * `groupFields` (partition columns) and split the file set into one
    * `(groupValues, files)` entry per live group, so `SELECT part,
    * count(*) … GROUP BY part` costs zero file opens. The scan schema
    * follows Spark's pushed-aggregate convention: group columns first,
    * then aggregate columns, one partial row per group (the final
    * aggregate re-groups, so semantics match a real scan exactly). */
  def tryAnswerGrouped(
      schema: StructType,
      groupFields: Seq[StructField],
      groups: Seq[(Seq[Any], Seq[String])],
      stats: Map[String, Map[String, ColStat]],
      agg: Aggregation): Option[(StructType, Seq[InternalRow])] = {
    if (agg.aggregateExpressions.isEmpty) return None
    val perGroup = groups.map { case (gv, files) =>
      val got = files.map(stats.get)
      if (!got.forall(_.isDefined)) return None
      val fs = got.map(_.get)
      val answered = agg.aggregateExpressions.toSeq.map {
        case _: CountStar =>
          rowCounts(fs).map(rs =>
            StructField("count(*)", LongType, nullable = false) ->
              (java.lang.Long.valueOf(rs.sum): Any))
        case c: Count if !c.isDistinct =>
          singleCol(c.column).flatMap(col => countCol(fs, col).map(n =>
            StructField(s"count($col)", LongType, nullable = false) ->
              (java.lang.Long.valueOf(n): Any)))
        case m: Min =>
          singleCol(m.column).flatMap(col => bound(schema, fs, col, isMin = true)
            .map { case (dt, v) => StructField(s"min($col)", dt, nullable = true) -> v })
        case m: Max =>
          singleCol(m.column).flatMap(col => bound(schema, fs, col, isMin = false)
            .map { case (dt, v) => StructField(s"max($col)", dt, nullable = true) -> v })
        case _ => None
      }
      if (answered.exists(_.isEmpty)) return None
      gv -> answered.map(_.get)
    }
    val aggFields = perGroup.headOption.map(_._2.map(_._1))
      .getOrElse(agg.aggregateExpressions.toSeq.map {
        // no live groups (empty table, ungrouped caller passes one group so
        // this is the grouped-empty case: zero output rows, schema still
        // needed)
        case _: CountStar => StructField("count(*)", LongType, nullable = false)
        case c: Count => StructField(
          s"count(${singleCol(c.column).getOrElse(return None)})",
          LongType, nullable = false)
        case m: Min =>
          val col = singleCol(m.column).getOrElse(return None)
          StructField(s"min($col)",
            schema.fields.find(_.name == col).getOrElse(return None).dataType)
        case m: Max =>
          val col = singleCol(m.column).getOrElse(return None)
          StructField(s"max($col)",
            schema.fields.find(_.name == col).getOrElse(return None).dataType)
        case _ => return None
      })
    val outSchema = StructType(groupFields ++ aggFields)
    val rows = perGroup.map { case (gv, fields) =>
      new GenericInternalRow((gv ++ fields.map(_._2)).toArray): InternalRow
    }
    Some(outSchema -> rows)
  }

  private def singleCol(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case n: NamedReference if n.fieldNames.length == 1 => Some(n.fieldNames()(0))
      case _ => None
    }

  private def rowCounts(fs: Seq[Map[String, ColStat]]): Option[Seq[Long]] = {
    val rs = fs.map(_.get(RowCountKey).filter(_.kind == "r").map(_.nulls))
    if (rs.forall(_.isDefined)) Some(rs.map(_.get)) else None
  }

  private def countCol(fs: Seq[Map[String, ColStat]], col: String): Option[Long] =
    rowCounts(fs).flatMap { rs =>
      val nulls = fs.map(_.get(col).map(_.nulls))
      if (nulls.forall(_.exists(_ >= 0L)))
        Some(rs.zip(nulls.map(_.get)).map { case (r, n) => r - n }.sum)
      else None
    }

  /** Combined min (or max) of `col` across all files, materialized as the
    * catalyst value of the column's type; `Some(dt -> null)` = the column
    * holds no non-null value (empty table or all-null files). */
  private def bound(
      schema: StructType, fs: Seq[Map[String, ColStat]], col: String,
      isMin: Boolean): Option[(DataType, Any)] = {
    val dt = schema.fields.find(_.name == col).map(_.dataType).getOrElse(return None)
    val kind = dt match {
      case IntegerType | LongType | DateType => "l"
      case FloatType | DoubleType => "d"
      case StringType => "s"
      case _ => return None
    }
    // every file must speak for the column: matching-kind stats or
    // provably all-null ("n"); anything else is unknown → real scan
    val sts = fs.map(_.get(col))
    if (!sts.forall(_.exists(st => st.kind == kind || st.kind == "n"))) return None
    val contributing = sts.map(_.get).filter(_.kind == kind)
    val raw = contributing.map(st => if (isMin) st.min else st.max)
    if (raw.isEmpty) return Some(dt -> null)
    if (kind == "s") {
      val byUtf8 = Ordering.comparatorToOrdering(new java.util.Comparator[String] {
        def compare(a: String, b: String): Int = FileStatsPruning.utf8Compare(a, b)
      })
      val v = if (isMin) raw.min(byUtf8) else raw.max(byUtf8)
      Some(dt -> UTF8String.fromString(v))
    } else {
      val parsed = raw.map(s => scala.util.Try(BigDecimal(s)).getOrElse(return None))
      val bd = if (isMin) parsed.min else parsed.max
      dt match {
        case IntegerType | DateType =>
          scala.util.Try(bd.toIntExact).toOption.map(v => dt -> (v: Any))
        case LongType =>
          scala.util.Try(bd.toLongExact).toOption.map(v => dt -> (v: Any))
        case DoubleType =>
          if (bd.signum == 0) None else Some(dt -> (bd.toDouble: Any))
        case FloatType =>
          if (bd.signum == 0) None else Some(dt -> (bd.toFloat: Any))
        case _ => None
      }
    }
  }
}
