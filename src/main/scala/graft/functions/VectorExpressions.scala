package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math — the hot path of
  * similarity search ([[graft.ops.Similarity]]).
  *
  * Why custom expressions (SURVEY §7.3): the composable alternative —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — allocates an intermediate
  * array per row and evaluates lambdas interpretively per element, outside
  * whole-stage codegen. These expressions generate a tight primitive loop
  * into the WholeStageCodegen body instead: no allocation, no virtual
  * calls. Semantics are identical (left-to-right double accumulation,
  * null elements count as 0, /0 → null like Spark's non-ANSI Divide).
  *
  * Float, double, and integral (byte/short/int/long) element arrays are
  * accepted — integral arrays are what the int8-quantized ANN path
  * ([[graft.ops.Similarity.quantizedTopK]]) scores with, and integer
  * products summed in double are exact below 2^53, so the quantized dot is
  * order-independent besides.
  */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def numericElem(t: DataType): Boolean = t match {
    case FloatType | DoubleType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _)) if numericElem(lt) && numericElem(rt) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<numeric> inputs, got ($l, $r)")
    }

  protected def elemTypeOf(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Integral element getter (exact — no double round-trip). */
  protected def getLong(arr: ArrayData, i: Int, t: DataType): Long = t match {
    case ByteType => arr.getByte(i).toLong
    case ShortType => arr.getShort(i).toLong
    case IntegerType => arr.getInt(i).toLong
    case LongType => arr.getLong(i)
    case other => throw new IllegalStateException(s"not integral: $other")
  }

  /** Java integral element-read snippet for codegen. */
  protected def getLongJava(arr: String, i: String, t: DataType): String = t match {
    case ByteType => s"(long) $arr.getByte($i)"
    case ShortType => s"(long) $arr.getShort($i)"
    case IntegerType => s"(long) $arr.getInt($i)"
    case LongType => s"$arr.getLong($i)"
    case other => throw new IllegalStateException(s"not integral: $other")
  }

  /** Element getter for interpreted eval. */
  protected def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case ByteType => arr.getByte(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unexpected element type $other")
  }

  /** Java element-read snippet for codegen. */
  protected def getJava(arr: String, i: String, t: DataType): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case other => throw new IllegalStateException(s"unexpected element type $other")
  }
}

/** `vec_dot(a, b)` — dot product of two numeric arrays. */
case class VecDot(left: Expression, right: Expression) extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemTypeOf(left); val rf = elemTypeOf(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += get(x, i, lf) * get(y, i, rf)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lf = elemTypeOf(left); val rf = elemTypeOf(right)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            $acc += ${getJava(a, i, lf)} * ${getJava(b, i, rf)};
          }
        }
        ${ev.value} = $acc;
      """
    })

  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `vec_cosine(a, b)` — cosine similarity in one pass (dot and both norms
  * in a single loop; three composed aggregates would scan the arrays three
  * times). Returns null when either norm is 0 (matches non-ANSI Divide). */
case class VecCosine(left: Expression, right: Expression) extends VectorBinaryExpression {

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemTypeOf(left); val rf = elemTypeOf(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else get(x, i, lf)
      val yv = if (y.isNullAt(i)) 0.0 else get(y, i, rf)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lf = elemTypeOf(left); val rf = elemTypeOf(right)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = $a.isNullAt($i) ? 0.0 : ${getJava(a, i, lf)};
          double $yv = $b.isNullAt($i) ? 0.0 : ${getJava(b, i, rf)};
          $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
        }
        double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        if ($denom == 0.0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / $denom;
        }
      """
    })

  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `vec_eq_count(a, b)` — number of positions (up to the shorter length)
  * where both elements are non-null and equal. The MinHash
  * signature-agreement kernel: the composable `size(filter(zip_with(...)))`
  * spelling allocates two intermediate arrays per candidate pair and
  * evaluates lambdas interpretively — this is one compiled loop. */
case class VecEqCount(left: Expression, right: Expression) extends VectorBinaryExpression {

  override def dataType: DataType = LongType

  // both integral → compare as long (a double round-trip would equate
  // distinct values above 2^53); anything else compares as double
  private def bothIntegral: Boolean =
    isIntegral(elemTypeOf(left)) && isIntegral(elemTypeOf(right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemTypeOf(left); val rf = elemTypeOf(right)
    val asLong = bothIntegral
    val n = math.min(x.numElements(), y.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val eq =
          if (asLong) getLong(x, i, lf) == getLong(y, i, rf)
          else get(x, i, lf) == get(y, i, rf)
        if (eq) c += 1L
      }
      i += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lf = elemTypeOf(left); val rf = elemTypeOf(right)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val cmp =
        if (bothIntegral) s"${getLongJava(a, i, lf)} == ${getLongJava(b, i, rf)}"
        else s"${getJava(a, i, lf)} == ${getJava(b, i, rf)}"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $c = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i) && $cmp) {
            $c++;
          }
        }
        ${ev.value} = $c;
      """
    })

  override def prettyName: String = "vec_eq_count"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API + SQL registration for the native vector functions. */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    Shims.column(VecDot(Shims.expression(a), Shims.expression(b)))

  def cosine(a: Column, b: Column): Column =
    Shims.column(VecCosine(Shims.expression(a), Shims.expression(b)))

  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))

  def eqCount(a: Column, b: Column): Column =
    Shims.column(VecEqCount(Shims.expression(a), Shims.expression(b)))

  /** Extract a foldable integer argument (e.g. `minhash_array(sh, 32)`):
    * a clear analysis-time error for a non-literal instead of an opaque
    * eval() failure on an unbound attribute. */
  private[functions] def intArg(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: argument must be a literal integer, got $e")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** SQL names registered into a session (also injected session-wide by
    * [[GraftExtensions]] for `--conf spark.sql.extensions=`). */
  val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { args => VecDot(args(0), args(1)) },
    "vec_cosine" -> { args => VecCosine(args(0), args(1)) },
    "vec_eq_count" -> { args => VecEqCount(args(0), args(1)) },
    "shingle_windows" -> { args =>
      ShingleWindows(args(0), intArg(args(1), "shingle_windows")) },
    "minhash_array" -> { args =>
      MinhashArray(args(0), intArg(args(1), "minhash_array")) },
    "simhash_array" -> { args => SimhashArray(args(0)) },
    "feature_hash" -> { args =>
      FeatureHash(args(0), intArg(args(1), "feature_hash")) },
    "z_value" -> { args => ZValueArray(args(0), intArg(args(1), "z_value")) },
    "token_counts" -> { args => TokenCounts(args(0)) },
    "char_pair_counts" -> { args => CharPairCounts(args(0)) },
    "word_pair_counts" -> { args => WordPairCounts(args(0)) })

  /** Imperative registration for an existing session (tests, Verify). */
  def register(spark: SparkSession): Unit = registry.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}

/** `SparkSessionExtensions` hook: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` and the vector
  * functions resolve in any SQL/DataFrame query of the session. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {

  import VectorFunctions.intArg

  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (args: Seq[Expression]) => VecCosine(args(0), args(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_eq_count"),
      new ExpressionInfo(classOf[VecEqCount].getName, "vec_eq_count"),
      (args: Seq[Expression]) => VecEqCount(args(0), args(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_windows"),
      new ExpressionInfo(classOf[ShingleWindows].getName, "shingle_windows"),
      (args: Seq[Expression]) =>
        ShingleWindows(args(0), intArg(args(1), "shingle_windows"))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_array"),
      new ExpressionInfo(classOf[MinhashArray].getName, "minhash_array"),
      (args: Seq[Expression]) =>
        MinhashArray(args(0), intArg(args(1), "minhash_array"))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_array"),
      new ExpressionInfo(classOf[SimhashArray].getName, "simhash_array"),
      (args: Seq[Expression]) => SimhashArray(args(0))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("feature_hash"),
      new ExpressionInfo(classOf[FeatureHash].getName, "feature_hash"),
      (args: Seq[Expression]) =>
        FeatureHash(args(0), intArg(args(1), "feature_hash"))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("z_value"),
      new ExpressionInfo(classOf[ZValueArray].getName, "z_value"),
      (args: Seq[Expression]) =>
        ZValueArray(args(0), intArg(args(1), "z_value"))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "token_counts"),
      (args: Seq[Expression]) => TokenCounts(args(0))))
    // streaming column pruning for graft-table sources: the micro-batch
    // planner never calls pruneColumns, so the projection travels
    // through this per-batch optimizer rule instead
    ext.injectOptimizerRule(_ => graft.sources.PruneGraftStreamColumns)
  }
}
