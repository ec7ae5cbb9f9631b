package graft

import org.apache.spark.sql.SparkSession

/** Measurement probe (optimization round, guide §1): what does ONE
  * `df.write.parquet` of a small frame cost on the driver, and which
  * write-path knobs move it? Interleaved A/B so JIT warmth cannot
  * masquerade as a config win. Not part of any query path.
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(0, 200000, 1, 8).selectExpr("id", "id * 2 as v",
      "cast(id as string) as s")
    val base = java.nio.file.Files.createTempDirectory("wp").toString

    val variants: Seq[(String, org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] => org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row])] = Seq(
      "default" -> identity,
      "v2" -> (w => w.option("mapreduce.fileoutputcommitter.algorithm.version", "2")),
      "v2+nosucc+nosum" -> (w => w
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .option("parquet.summary.metadata.level", "NONE")),
      "1part" -> identity
    )
    val df1 = df.coalesce(1)
    // warm everything
    variants.foreach { case (l, f) => f(df.write).parquet(s"$base/warm-$l") }
    val acc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    (1 to 12).foreach { i =>
      variants.foreach { case (l, f) =>
        val d = if (l == "1part") df1 else df
        val t0 = System.nanoTime()
        f(d.write).parquet(s"$base/$l-$i")
        acc(l) += System.nanoTime() - t0
      }
    }
    variants.foreach { case (l, _) =>
      println(s"PROBE $l: ${acc(l) / 1000000 / 12} ms/write")
    }
    spark.stop()
  }
}
