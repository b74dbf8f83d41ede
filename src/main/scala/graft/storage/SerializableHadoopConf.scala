package graft.storage

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable carrier for the driver's Hadoop configuration.
  *
  * `Configuration` itself is not `Serializable`, so executor-side code
  * that builds one with `new Configuration()` silently drops every
  * session override — credentials, `fs.<scheme>.impl` bindings, endpoint
  * settings — and only works on a default-conf local filesystem. Each
  * write/read factory captures one of these on the driver (from
  * `sessionState.newHadoopConf()`, which layers SQL-session `hadoop.*`
  * confs over the SparkContext's) and the task-side code resolves
  * filesystems from `value`. Same shape as Spark's own (private)
  * `org.apache.spark.util.SerializableConfiguration`, re-expressed here
  * because the public API does not export it.
  *
  * The deserialized `value` is task-local (one per deserialized factory),
  * so read-mostly use (`Path.getFileSystem`) needs no locking; code that
  * must MUTATE a conf (e.g. parquet write-support schema injection)
  * copies first with `new Configuration(value)`.
  */
private[graft] class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[graft] object SerializableHadoopConf {
  /** THE GIVEN session's conf, captured for executor use. Must be called
    * on the driver (factory construction / plan time). Takes the session
    * explicitly — `SparkSession.active` is a thread-local that can point
    * at a different session than the one executing the write (cloned
    * sessions, background threads), which would capture the wrong
    * credentials/fs bindings. */
  def capture(spark: org.apache.spark.sql.SparkSession): SerializableHadoopConf =
    new SerializableHadoopConf(spark.sessionState.newHadoopConf())
}
