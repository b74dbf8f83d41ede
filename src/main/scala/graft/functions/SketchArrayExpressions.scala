package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Per-row sketch expressions — the narrow, shuffle-free formulation of the
  * MinHash/SimHash pipelines.
  *
  * A document's tokens live in ONE row, so its signature is a per-row fold:
  * the explode → window → re-aggregate spelling ([[SketchAggregates]])
  * pays a full exchange and an ObjectHashAggregate to compute something
  * that never crosses row boundaries. These expressions keep the whole
  * signature stage inside one WholeStageCodegen scan: tokens → hashes →
  * window sums → permutation minima, all tight compiled loops, no shuffle
  * until the band join itself. The aggregate forms remain for genuinely
  * pre-exploded inputs (e.g. token streams).
  *
  * Each expression evaluates its array input exactly once per row — the
  * composable HOF spelling (`transform(sequence(...), i -> element_at(th,
  * i) ...)`) re-evaluates the token-hash array per element unless the
  * optimizer happens to keep the projection boundary (the lambda-recompute
  * trap), and is interpreted per element besides.
  *
  * Arithmetic is IDENTICAL to the aggregate forms (wrapping 64-bit window
  * sums, pmod into 2^31-1, LCG permutation constants, sentinel p / 0 for
  * empty inputs) — the DuckDB oracles and golden tests pin this.
  */
abstract class SketchArrayExpression extends UnaryExpression {

  protected def elemType: DataType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == elemType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<$elemType>, got $t")
    }

  /** The per-row kernel: compiled Scala invoked once per row from the
    * generated code (one virtual call, tight loop inside — stays within
    * the WholeStageCodegen pipeline, no fallback). */
  def compute(arr: ArrayData): Any

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj(prettyName, this, classOf[SketchArrayExpression].getName)
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    // compute() returns Object; a primitive result must go through its box
    // (`(long) Object` is illegal Java — Janino rejects it and the whole
    // stage silently falls back to interpreted eval)
    val cast =
      if (CodeGenerator.isPrimitiveType(dataType))
        s"((${CodeGenerator.boxedType(dataType)}) $self.compute(%s)).${CodeGenerator.javaType(dataType)}Value()"
      else
        s"(${CodeGenerator.javaType(dataType)}) $self.compute(%s)"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${cast.format(c)};")
  }
}

/** `shingle_windows(th, k)`: k-token rolling window combination of a
  * token-hash array — `sh[i] = Σ_j th[i+j] · (31·(2j+1)+7)`, wrapping
  * 64-bit arithmetic, `n-k+1` complete windows (empty for short docs).
  * Hash-equivalent to hashing the shingle string, with no string
  * materialization ([[graft.ops.Dedup.shingleHashRows]] is the exploded
  * twin; reference for the weights). */
case class ShingleWindows(child: Expression, k: Int) extends SketchArrayExpression {

  override protected def elemType: DataType = LongType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val weights = Array.tabulate(k)(j => 31L * (j * 2 + 1) + 7L)

  override def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    val m = math.max(0, n - k + 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var s = 0L
      var j = 0
      while (j < k) { s += arr.getLong(i + j) * weights(j); j += 1 }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "shingle_windows"
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `minhash_array(sh, numHashes)`: per-row MinHash signature over a
  * shingle-hash array — pmod into 2^31-1 then `min((h·a_i + b_i) mod p)`
  * per permutation; sentinel `p` for empty inputs. Same constants as
  * [[MinhashAgg]]. */
case class MinhashArray(child: Expression, numHashes: Int) extends SketchArrayExpression {

  override protected def elemType: DataType = LongType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val p = 2147483647L
  private val as = Array.tabulate(numHashes)(i => 1103515245L * (i + 1) % p)
  private val bs = Array.tabulate(numHashes)(i => 12345L * (i * 2 + 1) % p)

  override def compute(arr: ArrayData): Any = {
    val sig = Array.fill(numHashes)(p)
    val n = arr.numElements()
    var r = 0
    while (r < n) {
      var h = arr.getLong(r) % p
      if (h < 0) h += p // pmod
      var i = 0
      while (i < numHashes) {
        val perm = (h * as(i) + bs(i)) % p
        if (perm < sig(i)) sig(i) = perm
        i += 1
      }
      r += 1
    }
    new GenericArrayData(sig)
  }

  override def prettyName: String = "minhash_array"
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `simhash_array(th)`: per-row 64-bit SimHash of a token-hash array —
  * per bit, sum ±1 over tokens; bit set where the sum is positive; empty
  * input → 0. Same semantics as [[SimhashAgg]]. */
case class SimhashArray(child: Expression) extends SketchArrayExpression {

  override protected def elemType: DataType = LongType
  override def dataType: DataType = LongType

  override def compute(arr: ArrayData): Any = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var r = 0
    while (r < n) {
      val h = arr.getLong(r)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      r += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }

  override def prettyName: String = "simhash_array"
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `feature_hash(th, dim)`: hashing-trick bag-of-words embedding — each
  * token hash lands in bucket `pmod(h, dim)` with sign from hash bit 20
  * (a bit independent of the low bucket bits), summed per bucket. The
  * classic feature-hashing vectorizer: model-free document embeddings
  * whose cosine approximates token-multiset similarity, feeding
  * [[graft.ops.Similarity]] directly. Values are exact small integers
  * (as floats), so downstream double arithmetic is order-independent. */
case class FeatureHash(child: Expression, dim: Int) extends SketchArrayExpression {

  override protected def elemType: DataType = LongType
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def compute(arr: ArrayData): Any = {
    val v = new Array[Float](dim)
    val n = arr.numElements()
    var r = 0
    while (r < n) {
      val h = arr.getLong(r)
      var b = (h % dim).toInt
      if (b < 0) b += dim // pmod
      v(b) += (if (((h >>> 20) & 1L) == 1L) -1f else 1f)
      r += 1
    }
    new GenericArrayData(v)
  }

  override def prettyName: String = "feature_hash"
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `token_counts(toks)`: per-row term frequencies —
  * `array<struct<token, tf>>` in first-occurrence order (deterministic).
  * A document's tokens live in ONE row, so tf is a per-row fold, not an
  * aggregation: computing it here removes the widest exchange from TF-IDF
  * shapes (the explode + groupBy(doc, token) that shuffles every raw term
  * instance) — downstream only distinct (doc, token, tf) rows move. */
case class TokenCounts(child: Expression) extends SketchArrayExpression {

  override protected def elemType: DataType = StringType
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    // LinkedHashMap: first-seen iteration order -> deterministic output
    val counts =
      new java.util.LinkedHashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
    var i = 0
    while (i < n) {
      // skip null elements (SQL-registered: arbitrary arrays may carry
      // nulls; a null key would NPE on the output copy)
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val prev = counts.get(t)
        counts.put(t, if (prev == null) java.lang.Long.valueOf(1L)
                      else java.lang.Long.valueOf(prev.longValue + 1L))
      }
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      // copy: the input array may be backed by a reused row buffer
      out(j) = org.apache.spark.sql.catalyst.InternalRow(e.getKey.copy(), e.getValue.longValue)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "token_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `char_pair_counts(tokens)`: counts of adjacent character pairs WITHIN
  * each token (the BPE merge-candidate statistic) folded per row —
  * array<struct<c1,c2,tf>> in first-seen order. Characters are Unicode
  * code points, matching SQL `substring(tok, i, 1)` semantics exactly, so
  * the explode → double-substring spelling and this fold hash-match.
  *
  * Why: the HOF spelling explodes every PAIR INSTANCE (two explodes, ~L
  * rows per doc into the aggregate); this emits each doc's DISTINCT pairs
  * with counts in one compiled pass, so the exchange input shrinks by the
  * per-doc repetition factor and the substring churn disappears. */
case class CharPairCounts(child: Expression) extends SketchArrayExpression {

  override protected def elemType: DataType = StringType
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("c1", StringType, nullable = false),
      StructField("c2", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    // LinkedHashMap: first-seen iteration order -> deterministic output.
    // Key = both code points packed in one long (each fits 21 bits) -- no
    // separator-collision hazard, no per-pair string churn in the loop.
    val counts = new java.util.LinkedHashMap[java.lang.Long, java.lang.Long]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val cps = arr.getUTF8String(i).toString.codePoints().toArray
        var j = 0
        while (j < cps.length - 1) {
          val key = java.lang.Long.valueOf((cps(j).toLong << 21) | cps(j + 1).toLong)
          val prev = counts.get(key)
          counts.put(key, if (prev == null) java.lang.Long.valueOf(1L)
                          else java.lang.Long.valueOf(prev.longValue + 1L))
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey.longValue
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          new String(Character.toChars((k >> 21).toInt))),
        org.apache.spark.unsafe.types.UTF8String.fromString(
          new String(Character.toChars((k & 0x1FFFFF).toInt))),
        e.getValue.longValue)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "char_pair_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `word_pair_counts(tokens)`: counts of ADJACENT TOKEN pairs across the
  * document (the bigram statistic behind the bigram-LM familiarity and PMI
  * operators) folded per row -- array<struct<w1,w2,tf>> in first-seen
  * order. Equivalent to exploding every bigram instance and grouping by
  * (doc, w1, w2), but computed narrow: the per-doc reduction that fed the
  * first exchange of both bigram pipelines disappears into the scan. */
case class WordPairCounts(child: Expression) extends SketchArrayExpression {

  override protected def elemType: DataType = StringType
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    // first-seen order -> deterministic output; UTF8String keys are copied
    // at insert (the input array may be backed by a reused row buffer)
    val counts = new scala.collection.mutable.LinkedHashMap[
      (org.apache.spark.unsafe.types.UTF8String,
       org.apache.spark.unsafe.types.UTF8String), Long]()
    var i = 0
    while (i < n - 1) {
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
        val k = (arr.getUTF8String(i), arr.getUTF8String(i + 1))
        counts.get(k) match {
          case Some(c) => counts.update(k, c + 1L)
          case None    => counts.update((k._1.copy(), k._2.copy()), 1L)
        }
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    var j = 0
    val it = counts.iterator
    while (it.hasNext) {
      val ((w1, w2), c) = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(w1, w2, c)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "word_pair_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `z_value(bins, bits)`: Morton (Z-order) interleave of the lowest `bits`
  * bits of each element — element c's bit b lands at output bit
  * `b·n + c`, so nearby points in ALL dimensions get nearby z-values.
  * The layout key behind [[graft.ops.Layout.cluster]]: range-partitioning
  * a table by z-value makes every file's per-column min/max tight in every
  * clustered dimension at once, which is what lets engines skip files for
  * multi-dimensional predicates. Requires `n·bits ≤ 63`. */
case class ZValueArray(child: Expression, bits: Int) extends SketchArrayExpression {

  override protected def elemType: DataType = LongType
  override def dataType: DataType = LongType

  override def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    require(n * bits <= 63, s"z_value: $n cols × $bits bits exceeds 63 bits")
    var out = 0L
    var c = 0
    while (c < n) {
      val v = arr.getLong(c)
      var b = 0
      while (b < bits) {
        out |= ((v >>> b) & 1L) << (b * n + c)
        b += 1
      }
      c += 1
    }
    out
  }

  override def prettyName: String = "z_value"
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `srp_keys(vec)`: all `tables` SRP-LSH bucket keys of an embedding in
  * ONE pass over the array — the fused form of `tables × bits` separate
  * plane dot products (each of which re-traverses the vector). The
  * transposed loop adds `v_d · sign(p,d)` into every plane accumulator
  * for ascending d, so each plane's projection is the SAME left-to-right
  * fold as `vec_dot(vec, planeSigns)` — bit-identical keys, and the
  * cross-engine oracle built from the literal plane matrix keeps
  * matching. Null elements are skipped (VecDot semantics). */
case class SrpKeys(child: Expression, dim: Int, bits: Int, tables: Int)
  extends SketchArrayExpression {

  override protected def elemType: DataType = FloatType // unused: check overridden
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // accept float OR double embeddings (the per-plane vec_dot spelling this
  // fuses accepted any numeric array; narrowing would break callers)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got $t")
    }

  private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // plane-major sign matrix [tables·bits][dim]
  private val signs: Array[Array[Double]] =
    Array.tabulate(tables * bits)(p =>
      graft.ops.Similarity.planeSignVector(p, dim).toArray)

  override def compute(arr: ArrayData): Any = {
    val nPlanes = tables * bits
    val acc = new Array[Double](nPlanes)
    val n = math.min(arr.numElements(), dim)
    var d = 0
    while (d < n) {
      if (!arr.isNullAt(d)) {
        val v = if (elemIsFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        var p = 0
        while (p < nPlanes) { acc(p) += v * signs(p)(d); p += 1 }
      }
      d += 1
    }
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bits) {
        if (acc(t * bits + b) >= 0) key |= (1L << b)
        b += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }

  override def prettyName: String = "srp_keys"
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `excise_keep_indices(n_tokens, cuts, k)`: the surviving token indices
  * of [[graft.ops.Dedup.exciseDuplicateSpans]]'s rewrite — every index not
  * covered by any cut window `[p, p+k)` for a start `p` in the SORTED cut
  * array. The sorted-cuts two-pointer merge: one forward pass over the
  * token indices advancing a cursor through the cuts and carrying the
  * furthest covered end — O(n + cuts) per row, vs the O(n × cuts) a
  * `filter(idxs, i -> exists(cuts, ...))` HOF spelling pays (quadratic
  * for a book-length doc dense with duplicated spans, the exact shape the
  * excision pass exists for at crawl scale). */
case class ExciseKeepIndices(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"$prettyName requires (int, array<int>), got ($l, $r)")
    }

  def compute(n: Int, cuts: ArrayData): Any = {
    val m = cuts.numElements()
    val out = new Array[Int](math.max(n, 0))
    var c = 0        // cursor into the sorted cut starts
    var coverEnd = 0 // exclusive end of the furthest cut window started
    var kept = 0
    var i = 0
    while (i < n) {
      while (c < m && cuts.getInt(c) <= i) {
        val e = cuts.getInt(c) + k
        if (e > coverEnd) coverEnd = e
        c += 1
      }
      if (i >= coverEnd) { out(kept) = i; kept += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, kept))
  }

  override def nullSafeEval(n: Any, cuts: Any): Any =
    compute(n.asInstanceOf[Int], cuts.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj(prettyName, this, classOf[ExciseKeepIndices].getName)
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    nullSafeCodeGen(ctx, ev, (n, cuts) =>
      s"${ev.value} = (${CodeGenerator.javaType(dataType)}) $self.compute($n, $cuts);")
  }

  override def prettyName: String = "excise_keep_indices"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SketchArrayExpressions {
  def shingleWindows(th: Column, k: Int): Column =
    Shims.column(ShingleWindows(Shims.expression(th), k))
  def exciseKeepIndices(nTokens: Column, cuts: Column, k: Int): Column =
    Shims.column(ExciseKeepIndices(
      Shims.expression(nTokens), Shims.expression(cuts), k))
  def minhashArray(sh: Column, numHashes: Int): Column =
    Shims.column(MinhashArray(Shims.expression(sh), numHashes))
  def simhashArray(th: Column): Column =
    Shims.column(SimhashArray(Shims.expression(th)))
  def featureHash(th: Column, dim: Int): Column =
    Shims.column(FeatureHash(Shims.expression(th), dim))
  def zValue(bins: Column, bits: Int): Column =
    Shims.column(ZValueArray(Shims.expression(bins), bits))
  def tokenCounts(toks: Column): Column =
    Shims.column(TokenCounts(Shims.expression(toks)))
  def charPairCounts(toks: Column): Column =
    Shims.column(CharPairCounts(Shims.expression(toks)))
  def wordPairCounts(toks: Column): Column =
    Shims.column(WordPairCounts(Shims.expression(toks)))
  def srpKeys(vec: Column, dim: Int, bits: Int, tables: Int): Column =
    Shims.column(SrpKeys(Shims.expression(vec), dim, bits, tables))
}
