package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: q133 component costs (not part of the contract). */
object ProfileQ133 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.register(spark)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000000).count()
    val toks = "split(trim(text), '\\\\s+')"
    for (round <- 1 to 2) {
      println(s"== round $round ==")
      val sh = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), expr(s"graft_shingles($toks, 3)").as("sh"))
      val truth = timed("truth prefixJaccard(4/5) ckpt")(
        graft.operators.Dedup.prefixJaccardPairs(sh, 4, 5, 0.5)
          .select("id_a", "id_b").localCheckpoint())
      // bands
      val mh = sh
        .withColumn("mhs", expr("graft_minhash(sh, 12)"))
        .select(col("doc_id") +: col("sh") +:
          (0 until 12).map(i => col("mhs").getItem(i).as(s"mh$i")): _*)
      val banded = (0 until 4).foldLeft(mh) { (df, bnd) =>
        val cols = (0 until 3).map(j => s"mh${bnd * 3 + j}").mkString(", ")
        df.withColumn(s"band$bnd",
          expr(s"md5(cast(concat_ws('|', $cols) as binary))"))
      }
      val lng = banded.select(col("doc_id"),
        expr("stack(4, 0, band0, 1, band1, 2, band2, 3, band3)")
          .as(Seq("band", "bucket")))
      timed("minhash+band only")(banded.count())
      val aa = lng.toDF("id_a", "band", "bucket")
      val bb = lng.toDF("id_b", "band", "bucket")
      val bands = timed("band pairs ckpt")(
        aa.join(bb.hint("shuffle_hash"), Seq("band", "bucket"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct().localCheckpoint())
      // simhash
      val simBlocks = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), expr(s"graft_simhash64($toks)").as("sim"))
        .select(col("doc_id"),
          explode(expr("array(0, 1, 2, 3)")).as("blk"), col("sim"))
        .withColumn("block", expr("shiftright(sim, blk * 16) & 65535"))
      val simC = timed("simhash pairs ckpt")(
        simBlocks.select(col("blk"), col("block"), col("doc_id").as("id_a"))
          .join(simBlocks.select(col("blk"), col("block"),
            col("doc_id").as("id_b")).hint("shuffle_hash"), Seq("blk", "block"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct().localCheckpoint())
      println(s"[prof] sizes truth=${truth.count()} bands=${bands.count()} sim=${simC.count()}")
      timed("full q133")(
        SparkEntry.queries("q133_blocking_recall")(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
