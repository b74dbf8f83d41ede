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
  * stats compare as UNSIGNED UTF-8 BYTES — the one order Spark's
  * `UTF8String.compareTo` and parquet's BINARY footer min/max agree on.
  * `java.lang.String.compareTo` (UTF-16 code units) is NOT that order:
  * supplementary-plane codepoints encode as surrogate pairs (code units
  * 0xD800–0xDFFF) and sort BELOW U+E000–U+FFFF under code-unit order but
  * ABOVE them in UTF-8 bytes, so a code-unit comparison can prune a file
  * that contains matching rows. A null-count of -1 means UNKNOWN (some row
  * group's writer omitted it): null-sensitive checks keep the file. Kind
  * "u" (bounds scrubbed by the writer — e.g. a float row group containing
  * NaN — null count still exact) never prunes on range: its empty min/max
  * fail statVal, so every comparison evaluates unknown → keep. Date
  * values normalize to epoch days, mirroring the footer's INT32 date
  * physical form.
  */
object FileStatsPruning {

  def mayMatchAll(stats: Map[String, ColStat], filters: Seq[Filter]): Boolean =
    filters.forall(f => mayMatch(stats, f))

  /** [[mayMatchAll]] plus FILE-BLOOM probing for equality shapes: a file
    * whose bloom provably excludes every probed value is dropped even when
    * its min/max range straddles the value — the point-lookup case on a
    * high-cardinality unclustered column, where range stats never prune.
    * Bloom semantics guarantee no false negatives, so `false` here keeps
    * the same contract as the stats path: PROVABLY no matching row. */
  def mayMatchAll(
      stats: Map[String, ColStat],
      blooms: Map[String, GraftCatalog.FileBloom],
      filters: Seq[Filter]): Boolean =
    filters.forall(f => mayMatch(stats, f) && bloomMayMatch(blooms, f))

  /** The PROOF dual of [[mayMatch]]: `true` means EVERY row of the file
    * provably satisfies all `filters` — the license for a metadata-only
    * DELETE to drop the whole file without reading it. Everything
    * unknown is `false` (keep = rewrite), the safe direction.
    *
    * Kind discipline mirrors the bounds' semantics: RANGE proofs accept
    * writer-truncated "t" string bounds (truncation only WIDENS — the
    * recorded min is ≤ the true min and the recorded max ≥ the true max,
    * so `recordedMin > v` still proves every value > v); EQUALITY and
    * prefix proofs need exact bounds ("s"/numeric), because a truncated
    * bound is not a value any row holds. Null counts must be exactly 0
    * for any non-null-ness proof — a NULL row satisfies no comparison,
    * so a file with nulls (or an unknown count) can never fully match. */
  def mustMatchAll(stats: Map[String, ColStat], filters: Seq[Filter]): Boolean =
    filters.forall(f => mustMatch(stats, f))

  private def mustMatch(stats: Map[String, ColStat], f: Filter): Boolean = f match {
    case EqualTo(a, v) => constEquals(stats.get(a), v)
    case EqualNullSafe(a, v) =>
      if (v == null) stats.get(a).exists(_.kind == "n")
      else constEquals(stats.get(a), v)
    case GreaterThan(a, v) =>
      noNulls(stats.get(a)) && cmpMin(stats.get(a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) =>
      noNulls(stats.get(a)) && cmpMin(stats.get(a), v).exists(_ >= 0)
    case LessThan(a, v) =>
      noNulls(stats.get(a)) && cmpMax(stats.get(a), v).exists(_ < 0)
    case LessThanOrEqual(a, v) =>
      noNulls(stats.get(a)) && cmpMax(stats.get(a), v).exists(_ <= 0)
    case In(a, vs) =>
      vs != null && vs.exists(v => constEquals(stats.get(a), v))
    case IsNull(a) => stats.get(a).exists(_.kind == "n")
    case IsNotNull(a) => noNulls(stats.get(a))
    case StringStartsWith(a, p) =>
      // all values lie in [min, max]; if both bounds share the prefix,
      // lexicographic order forces every value between them to share it.
      // Exact bounds only: a truncated bound could share a prefix the
      // true extremum does not.
      stats.get(a).exists(st => st.kind == "s" && st.nulls == 0 && {
        val pb = utf8(p)
        utf8(st.min).take(pb.length).sameElements(pb) &&
          utf8(st.max).take(pb.length).sameElements(pb)
      })
    case And(l, r) => mustMatch(stats, l) && mustMatch(stats, r)
    case Or(l, r) => mustMatch(stats, l) || mustMatch(stats, r)
    case AlwaysTrue() => true // TRUNCATE's condition: every file all-match
    case _ => false
  }

  /** Every row equals `v`: exact-kind bounds, min == max == v, zero
    * nulls. */
  private def constEquals(st: Option[ColStat], v: Any): Boolean =
    st.exists(s => s.kind != "t" && s.kind != "u" && s.kind != "n" &&
      s.nulls == 0 &&
      (for (value <- norm(s.kind, v); mn <- statVal(s.kind, s.min);
            mx <- statVal(s.kind, s.max))
        yield compare(s.kind, mn, value) == 0 &&
          compare(s.kind, mx, value) == 0).getOrElse(false))

  private def noNulls(st: Option[ColStat]): Boolean = st.exists(_.nulls == 0)

  /** Conservative bloom evaluation: only equality-shaped predicates on a
    * bloom-indexed column can veto; everything else — no bloom for the
    * column, an unsupported literal type, a range/null shape — keeps the
    * file. The literal is hashed EXACTLY as the build side hashed the
    * column ([[graft.storage.GraftCatalog.buildBloomIndex]]): integrals
    * and dates canonicalize to INT64 before `xxhash64`, strings hash as
    * UTF-8; a literal type the canonicalization doesn't cover returns
    * "unknown", never a wrong hash. */
  private[storage] def bloomMayMatch(
      blooms: Map[String, GraftCatalog.FileBloom], f: Filter): Boolean = f match {
    case EqualTo(a, v) => bloomContains(blooms.get(a), v)
    case EqualNullSafe(a, v) if v != null => bloomContains(blooms.get(a), v)
    case In(a, vs) =>
      vs == null || vs.isEmpty || vs.exists(v => bloomContains(blooms.get(a), v))
    case And(l, r) => bloomMayMatch(blooms, l) && bloomMayMatch(blooms, r)
    case Or(l, r) => bloomMayMatch(blooms, l) || bloomMayMatch(blooms, r)
    case _ => true
  }

  private def bloomContains(b: Option[GraftCatalog.FileBloom], v: Any): Boolean =
    b match {
      case None => true
      case Some(bloom) =>
        literalHash(v) match {
          case None => true // unsupported literal type: unknown, keep
          case Some(h) =>
            graft.functions.BloomBits.mightContain(
              bloom.bits, h, bloom.numBits, bloom.numHashes)
        }
    }

  /** xxhash64 (seed 42, Spark's `xxhash64` function) of the literal in its
    * build-side canonical form: INT64 for integrals and epoch-day dates,
    * UTF8 string as-is. Returns None for types the build side refuses
    * (float/decimal/timestamp/boolean) — those columns can't have an
    * index, but a schema drift or a widened filter must degrade to "keep",
    * never to a mis-hashed probe. */
  private def literalHash(v: Any): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.types.{LongType, StringType}
    val lit: Option[Literal] = v match {
      case null => None
      case n: java.lang.Byte => Some(Literal(n.longValue(), LongType))
      case n: java.lang.Short => Some(Literal(n.longValue(), LongType))
      case n: java.lang.Integer => Some(Literal(n.longValue(), LongType))
      case n: java.lang.Long => Some(Literal(n.longValue(), LongType))
      case d: java.sql.Date => Some(Literal(d.toLocalDate.toEpochDay, LongType))
      case d: java.time.LocalDate => Some(Literal(d.toEpochDay, LongType))
      case s: String => Some(Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType))
      case _ => None
    }
    lit.map(l => new XxHash64(Seq(l)).eval(null).asInstanceOf[Long])
  }

  def mayMatch(stats: Map[String, ColStat], f: Filter): Boolean = f match {
    case EqualTo(a, v) => rangeMayContain(stats.get(a), v)
    case EqualNullSafe(a, v) =>
      if (v == null) stats.get(a).forall(mayHaveNulls)
      else rangeMayContain(stats.get(a), v)
    case GreaterThan(a, v) => cmpMax(stats.get(a), v).forall(_ > 0)
    case GreaterThanOrEqual(a, v) => cmpMax(stats.get(a), v).forall(_ >= 0)
    case LessThan(a, v) => cmpMin(stats.get(a), v).forall(_ < 0)
    case LessThanOrEqual(a, v) => cmpMin(stats.get(a), v).forall(_ <= 0)
    case In(a, vs) =>
      vs == null || vs.isEmpty || vs.exists(v => rangeMayContain(stats.get(a), v))
    case IsNull(a) => stats.get(a).forall(mayHaveNulls)
    case IsNotNull(a) => stats.get(a).forall(_.kind != "n")
    case StringStartsWith(a, p) =>
      // values starting with p form the byte-order interval [p, succ(p));
      // truncating the stats to p's BYTE length (not UTF-16 code units — a
      // code-unit cut can split a surrogate pair and corrupt the encoding)
      // gives: may-match iff minPrefix <= p-bytes <= maxPrefix. Kind "t"
      // (writer-truncated bounds) joins in: prefix-taking preserves byte
      // order, so widened bounds only ever widen the kept interval.
      stats.get(a).forall { st =>
        (st.kind != "s" && st.kind != "t") || {
          val pb = utf8(p)
          cmpBytes(utf8(st.min).take(pb.length), pb) <= 0 &&
            cmpBytes(utf8(st.max).take(pb.length), pb) >= 0
        }
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
    if (v == null) st.forall(mayHaveNulls)
    else cmpMin(st, v).forall(_ <= 0) && cmpMax(st, v).forall(_ >= 0)

  /** nulls == -1 means the writer omitted the count — unknown keeps the
    * file; only a recorded 0 proves the absence of nulls. */
  private def mayHaveNulls(st: ColStat): Boolean = st.nulls != 0

  private def compare(kind: String, statSide: Any, value: Any): Int = kind match {
    case "s" | "t" =>
      utf8Compare(statSide.asInstanceOf[String], value.asInstanceOf[String])
    case _ => statSide.asInstanceOf[BigDecimal].compare(value.asInstanceOf[BigDecimal])
  }

  /** Unsigned byte-wise comparison of the UTF-8 encodings — the order
    * `UTF8String.compareTo` uses and parquet BINARY footer stats are
    * computed in. Exposed for [[GraftCatalog.footerStats]]'s cross-row-group
    * min/max re-aggregation, which must use the SAME order. */
  private[storage] def utf8Compare(a: String, b: String): Int =
    cmpBytes(utf8(a), utf8(b))

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private def statVal(kind: String, raw: String): Option[Any] =
    if (kind == "s" || kind == "t") Some(raw)
    else if (raw.isEmpty) None
    else scala.util.Try(BigDecimal(raw)).toOption

  /** Normalize a pushed-filter literal to the stat domain. */
  private def norm(kind: String, v: Any): Option[Any] = (kind, v) match {
    case (_, null) => None
    case ("s" | "t", s: String) => Some(s)
    case ("s" | "t", _) => None
    case (_, d: java.sql.Date) => Some(BigDecimal(d.toLocalDate.toEpochDay))
    case (_, d: java.time.LocalDate) => Some(BigDecimal(d.toEpochDay))
    case (_, n: java.lang.Number) => scala.util.Try(BigDecimal(n.toString)).toOption
    case (_, b: BigDecimal) => Some(b)
    case (_, b: java.math.BigDecimal) => Some(BigDecimal(b))
    case _ => None
  }
}
