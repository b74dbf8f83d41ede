package graft

/** Throwaway exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "scratch")
    val sf = "/root/testdata/sf0.001"
    try {
      val ev = spark.read.parquet(s"$sf/events.parquet")
      ev.printSchema()
      ev.show(3, truncate = false)
    } catch { case e: Throwable => println(s"EVENTS FAIL: ${e.getMessage.take(500)}") }
    try {
      val em = spark.read.parquet(s"$sf/embeddings.parquet")
      em.printSchema()
      em.show(2)
    } catch { case e: Throwable => println(s"EMB FAIL: ${e.getMessage.take(500)}") }
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    li.printSchema()
    spark.stop()
  }
}
