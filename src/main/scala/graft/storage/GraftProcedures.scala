package graft.storage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures for the catalog's maintenance surface — the
  * Iceberg `CALL catalog.system.<proc>(...)` UX on the offline catalog
  * (Spark 4's `ProcedureCatalog`/`BoundProcedure` contract, SPARK-44167):
  *
  * {{{
  *   CALL cat.system.vacuum('ns.t', 2)
  *   CALL cat.system.build_bloom_index('ns.t', 'id,tag')
  *   CALL cat.system.cluster('ns.t', 'x,y')
  *   CALL cat.system.history('ns.t')
  * }}}
  *
  * Each call returns its report as a result set (a [[LocalScan]] — one
  * driver-local row, or one per snapshot for `history`), so maintenance
  * runs from ANY SQL client exactly like a query — the operational
  * surface a warehouse team automates against, no Scala entry point
  * needed. Arguments are positional and required; Spark's analyzer
  * coerces literals to the declared parameter types.
  */
object GraftProcedures {

  private final case class ProcResultScan(schema: StructType, rs: Seq[InternalRow])
    extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = rs.toArray
    override def description(): String = "GraftProcedureResult"
  }

  private def result(schema: StructType, rs: Seq[InternalRow]): java.util.Iterator[Scan] =
    java.util.List.of[Scan](ProcResultScan(schema, rs)).iterator()

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  /** One procedure = unbound + bound in one object (no overload
    * resolution to do — bind validates arity only; type coercion is the
    * analyzer's job against [[parameters]]). */
  private abstract class Proc(
      procName: String,
      params: Seq[ProcedureParameter],
      val outSchema: StructType)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft maintenance procedure $procName"
    override def bind(inputType: StructType): BoundProcedure = {
      require(inputType.fields.length == params.length,
        s"$procName expects ${params.length} arguments " +
          s"(${params.map(p => s"${p.name} ${p.dataType.simpleString}").mkString(", ")}), " +
          s"got ${inputType.fields.length}")
      this
    }
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
  }

  private def row(values: Any*): InternalRow =
    new GenericInternalRow(values.toArray)

  def names: Seq[String] =
    Seq("vacuum", "build_bloom_index", "cluster", "compact",
      "migrate_layout", "layout_summary", "rewrite_deletes", "history")

  def load(cat: GraftCatalog, name: String): Option[UnboundProcedure] = {
    // capture the calling query's session HERE: load runs during the CALL
    // statement's own analysis, where the thread-local SparkSession.active
    // is reliably the right session — call() may execute on another thread
    // (the same capture discipline as GraftWriteBuilder/GraftWriterFactory)
    val session = SparkSession.active
    name match {
    case "vacuum" => Some(new Proc("vacuum",
      Seq(in("table", StringType), in("keep_last", IntegerType)),
      StructType(Seq(StructField("deleted_files", IntegerType, nullable = false)))) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val ident = Identifier.of(
          table.split("\\.").dropRight(1), table.split("\\.").last)
        val deleted = cat.vacuum(ident, keepLast = input.getInt(1))
        result(outSchema, Seq(row(deleted)))
      }
    })
    case "build_bloom_index" => Some(new Proc("build_bloom_index",
      Seq(in("table", StringType), in("cols", StringType)),
      StructType(Seq(
        StructField("files_indexed", IntegerType, nullable = false),
        StructField("files_total", IntegerType, nullable = false)))) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (fresh, total) = cat.buildBloomIndex(session,
          input.getUTF8String(0).toString,
          input.getUTF8String(1).toString.split(",").map(_.trim).toSeq)
        result(outSchema, Seq(row(fresh, total)))
      }
    })
    case "cluster" => Some(new Proc("cluster",
      Seq(in("table", StringType), in("cols", StringType)),
      StructType(Seq(
        StructField("files_before", IntegerType, nullable = false),
        StructField("files_after", IntegerType, nullable = false)))) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (before, after) = cat.clusterTable(session,
          input.getUTF8String(0).toString,
          input.getUTF8String(1).toString.split(",").map(_.trim).toSeq)
        result(outSchema, Seq(row(before, after)))
      }
    })
    case "compact" => Some(new Proc("compact",
      Seq(in("table", StringType), in("target_files_per_partition", IntegerType)),
      StructType(Seq(
        StructField("files_before", IntegerType, nullable = false),
        StructField("files_after", IntegerType, nullable = false)))) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (before, after) = cat.compact(session,
          input.getUTF8String(0).toString, input.getInt(1))
        result(outSchema, Seq(row(before, after)))
      }
    })
    case "migrate_layout" => Some(new Proc("migrate_layout",
      Seq(in("table", StringType), in("target_files_per_partition", IntegerType),
        // OPTIONAL (bounded-work migration): 2-arg calls migrate the
        // whole legacy tail in one commit
        ProcedureParameter.in("max_files", IntegerType)
          .defaultValue(Int.MaxValue.toString).build()),
      StructType(Seq(
        StructField("files_migrated", IntegerType, nullable = false),
        StructField("files_kept", IntegerType, nullable = false)))) {
      // tolerate both shapes: analyzers that fill the default pass 3
      // fields; ones that bind the raw argument list pass 2
      override def bind(inputType: StructType): BoundProcedure = {
        require(inputType.fields.length == 2 || inputType.fields.length == 3,
          "migrate_layout expects (table STRING, target_files_per_partition " +
            s"INT[, max_files INT]), got ${inputType.fields.length} arguments")
        this
      }
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        // an explicit NULL max_files falls back to the default (an
        // unguarded getInt would read the null slot as 0)
        val maxFiles =
          if (input.numFields >= 3 && !input.isNullAt(2)) input.getInt(2)
          else Int.MaxValue
        val (migrated, kept) = cat.migrateLayout(session,
          input.getUTF8String(0).toString, input.getInt(1),
          maxFiles = maxFiles)
        result(outSchema, Seq(row(migrated, kept)))
      }
    })
    case "layout_summary" => Some(new Proc("layout_summary",
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("layout", StringType, nullable = false),
        StructField("is_current", BooleanType, nullable = false),
        StructField("files", IntegerType, nullable = false),
        StructField("rows", LongType, nullable = false)))) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val rs = cat.layoutSummary(input.getUTF8String(0).toString)
          .map { case (layout, isCur, files, rows) =>
            row(UTF8String.fromString(layout), isCur, files, rows)
          }
        result(outSchema, rs)
      }
    })
    case "rewrite_deletes" => Some(new Proc("rewrite_deletes",
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("files_rewritten", IntegerType, nullable = false),
        StructField("files_untouched", IntegerType, nullable = false)))) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (rewritten, untouched) = cat.compactDeletes(
          session, input.getUTF8String(0).toString)
        result(outSchema, Seq(row(rewritten, untouched)))
      }
    })
    case "history" => Some(new Proc("history",
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("snapshot", LongType, nullable = false),
        StructField("n_files", IntegerType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("files_added", IntegerType, nullable = false),
        StructField("files_removed", IntegerType, nullable = false),
        // append / overwrite / rewrite / delete — what incremental and
        // streaming consumers skip (rewrite) or serve; "unknown" pre-kind
        StructField("kind", StringType, nullable = false)))) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val ident = Identifier.of(
          table.split("\\.").dropRight(1), table.split("\\.").last)
        val rs = cat.history(ident).map { case (s, nf, nr, fa, fr, kind) =>
          row(s, nf, nr, fa, fr, UTF8String.fromString(kind))
        }
        result(outSchema, rs)
      }
    })
    case _ => None
    }
  }

  // compile-time guard: UTF8String import is load-bearing for getUTF8String
  private val _ = classOf[UTF8String]
}
