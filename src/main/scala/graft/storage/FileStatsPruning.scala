package graft.storage

import org.apache.spark.sql.sources._

import graft.storage.GraftCatalog.ColStat

/** Conservative may-match evaluation of pushed predicates against a data
  * file's manifest column stats ([[GraftCatalog.ColStat]]): `false` means
  * the file PROVABLY contains no matching row and is dropped from the scan
  * before any footer is opened; anything unknown — a column without stats,
  * a filter shape not modeled, a type mismatch — evaluates `true`.
  *
  * Comparisons: integral/floating stats compare as BigDecimal (exact for
  * every int64 and every parquet double rendered via toString); string
  * stats compare lexicographically, matching parquet's UTF-8 binary
  * ordering for the codepoint ranges Spark's string comparison agrees on
  * (an incomparable value keeps the file). Date values normalize to epoch
  * days, mirroring the footer's INT32 date physical form.
  */
object FileStatsPruning {

  def mayMatchAll(stats: Map[String, ColStat], filters: Seq[Filter]): Boolean =
    filters.forall(f => mayMatch(stats, f))

  def mayMatch(stats: Map[String, ColStat], f: Filter): Boolean = f match {
    case EqualTo(a, v) => rangeMayContain(stats.get(a), v)
    case EqualNullSafe(a, v) =>
      if (v == null) stats.get(a).forall(_.nulls > 0)
      else rangeMayContain(stats.get(a), v)
    case GreaterThan(a, v) => cmpMax(stats.get(a), v).forall(_ > 0)
    case GreaterThanOrEqual(a, v) => cmpMax(stats.get(a), v).forall(_ >= 0)
    case LessThan(a, v) => cmpMin(stats.get(a), v).forall(_ < 0)
    case LessThanOrEqual(a, v) => cmpMin(stats.get(a), v).forall(_ <= 0)
    case In(a, vs) =>
      vs == null || vs.isEmpty || vs.exists(v => rangeMayContain(stats.get(a), v))
    case IsNull(a) => stats.get(a).forall(_.nulls > 0)
    case IsNotNull(a) => stats.get(a).forall(_.kind != "n")
    case StringStartsWith(a, p) =>
      // a value starting with p sits in [p, p + maxChar): min <= p-extended
      // and max >= p under prefix comparison
      stats.get(a).forall { st =>
        st.kind != "s" || st.min.isEmpty ||
          (st.min.take(p.length) <= p && st.max.take(p.length) >= p)
      }
    case And(l, r) => mayMatch(stats, l) && mayMatch(stats, r)
    case Or(l, r) => mayMatch(stats, l) || mayMatch(stats, r)
    case Not(_) => true
    case _ => true
  }

  /** < 0 / 0 / > 0 when the file's MAX is below / at / above `v`; None =
    * not comparable (no stats, type mismatch) = keep. */
  private def cmpMax(st: Option[ColStat], v: Any): Option[Int] =
    for (s <- st; value <- norm(s.kind, v); mx <- statVal(s.kind, s.max))
      yield compare(s.kind, mx, value)

  private def cmpMin(st: Option[ColStat], v: Any): Option[Int] =
    for (s <- st; value <- norm(s.kind, v); mn <- statVal(s.kind, s.min))
      yield compare(s.kind, mn, value)

  private def rangeMayContain(st: Option[ColStat], v: Any): Boolean =
    if (v == null) st.forall(_.nulls > 0)
    else cmpMin(st, v).forall(_ <= 0) && cmpMax(st, v).forall(_ >= 0)

  private def compare(kind: String, statSide: Any, value: Any): Int = kind match {
    case "s" => statSide.asInstanceOf[String].compareTo(value.asInstanceOf[String])
    case _ => statSide.asInstanceOf[BigDecimal].compare(value.asInstanceOf[BigDecimal])
  }

  private def statVal(kind: String, raw: String): Option[Any] =
    if (raw.isEmpty && kind != "s") None
    else if (kind == "s") Some(raw)
    else scala.util.Try(BigDecimal(raw)).toOption

  /** Normalize a pushed-filter literal to the stat domain. */
  private def norm(kind: String, v: Any): Option[Any] = (kind, v) match {
    case (_, null) => None
    case ("s", s: String) => Some(s)
    case ("s", _) => None
    case (_, d: java.sql.Date) => Some(BigDecimal(d.toLocalDate.toEpochDay))
    case (_, d: java.time.LocalDate) => Some(BigDecimal(d.toEpochDay))
    case (_, n: java.lang.Number) => scala.util.Try(BigDecimal(n.toString)).toOption
    case (_, b: BigDecimal) => Some(b)
    case (_, b: java.math.BigDecimal) => Some(BigDecimal(b))
    case _ => None
  }
}
