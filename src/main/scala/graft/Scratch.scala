package graft

import org.apache.spark.sql.SparkSession

/** Temporary profiling scratch — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t0 = System.nanoTime(); df.count(); val t1 = System.nanoTime()
      val t2 = System.nanoTime(); SparkEntry.queries(n)(spark, sfDir).count(); val t3 = System.nanoTime()
      println(s"=== $n run1=${(t1 - t0) / 1e9}%s run2=${(t3 - t2) / 1e9}")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
