package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, EmptyBlock, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, IntegerType}

/** A constant window-partition key that SURVIVES optimization.
  *
  * `partitionBy(lit(0))` does not work for the purpose: Catalyst's
  * `EliminateWindowPartitions` strips foldable partition keys, restoring
  * the partition-free window and its plan-time data-wide warning. This
  * leaf expression evaluates to the same constant 0 for every row but
  * reports `foldable = false`, so the key stays in the spec: execution is
  * identical (one populated hash partition instead of the SinglePartition
  * exchange the bare window would require), codegen emits the literal. */
private[graft] case class BoundedFrameKey() extends LeafExpression {
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = 0
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = EmptyBlock, isNull = FalseLiteral,
      value = JavaCode.literal("0", IntegerType))
}

/** Global rank/cumulative windows over frames BOUNDED BY CONSTRUCTION —
  * a `limit(k)` result, a vocabulary, a bucket grid; never data.
  *
  * A partition-free window would be semantically identical on such a
  * frame, but it draws `WindowExec`'s data-wide "No Partition Defined"
  * warning at plan time, and hundreds of warnings from known-bounded
  * frames drown the one signal that warning exists for: a REAL data-wide
  * window showing up in a plan. The constant partition key keeps the
  * single-partition execution (every row shares key 0, so global order
  * and ranks are unchanged) while letting the plan state its intent —
  * and letting PlanSpec assert that NO partition-free WindowExec exists
  * anywhere in the query surface.
  *
  * Only use this over frames whose size is bounded by construction; a
  * constant key over an unbounded frame is the exact bug the warning
  * flags, minus the warning. */
object BoundedWindow {
  def orderBy(ord: Column*): WindowSpec =
    Window.partitionBy(Shims.column(BoundedFrameKey())).orderBy(ord: _*)

  /** `partitionBy` for group-col lists that may legitimately be empty
    * (e.g. an ungrouped running sum whose frame is one row per shuffle
    * partition): an empty list gets the constant key instead of a
    * partition-free spec. */
  def partitionBy(cols: Seq[Column]): WindowSpec =
    if (cols.isEmpty) Window.partitionBy(Shims.column(BoundedFrameKey()))
    else Window.partitionBy(cols: _*)
}
