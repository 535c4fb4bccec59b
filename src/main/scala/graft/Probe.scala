package graft

/** Scratch diagnostics main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", 8)
    val sf = "/root/testdata/sf0.001"
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sf, n)
      println(s"== $n: ${df.count()} rows")
      df.printSchema()
    }
    spark.stop()
  }
}
