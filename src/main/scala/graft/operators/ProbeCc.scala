package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporary r11 probe: pointer-jump CC vs plain propagation run to true
  * convergence on q195's sf0.1 edge graph — removed before commit.
  */
object ProbeCc {
  def plainCc(touched: DataFrame, sym: DataFrame, maxIter: Int): (DataFrame, Int) = {
    var labels = touched.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var prevSum = java.math.BigDecimal.valueOf(Long.MaxValue)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val viaEdges = sym
        .join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .unionByName(viaEdges)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(false)
      val s2 = next.agg(sum(col("component")).cast("decimal(38,0)")).collect()(0)
        .getDecimal(0)
      converged = s2.compareTo(prevSum) == 0
      prevSum = s2
      labels = next
      iter += 1
    }
    (labels, iter)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    // synthetic path graph probe: rounds for a 100-chain
    locally {
      import s.implicits._
      val path = (0L until 99L).map(i => (i, i + 1)).toDF("src", "dst")
      val t0p = System.nanoTime()
      val lab = ConnectedComponents.runOnEdges(path)
      val n0 = lab.filter(col("component") === 0L).count()
      println(f"PATH100 comp0=${n0} time=${(System.nanoTime() - t0p) / 1e9}%.2f s")
    }
    val tau = 0.35
    val k = Similarity.corpusCells(s, sfDir)
    val e = Synth.embeddings(s, sfDir)
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"), col("embedding"))
      .withColumn("cell", expr(Similarity.clusterExprSparkK("embedding", k)))
      .localCheckpoint()
    val a = e.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = e.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    val edges = a.join(b.hint("shuffle_hash"), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", expr(Dedup.dot("emb_a", "emb_b")))
      .filter(col("cos") >= tau)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .localCheckpoint()
    println(s"EDGES=${edges.count()}")

    val t0 = System.nanoTime()
    val jump = ConnectedComponents.runOnEdges(edges).localCheckpoint()
    println(f"JUMP done in ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=${jump.count()}")

    // count jump rounds (reimplementation of core with jumping)
    for (nJumps <- Seq(1, 2, 3)) {
      val e0j = edges.localCheckpoint()
      val touchedJ = e0j.select(col("src").as("id"))
        .unionByName(e0j.select(col("dst").as("id"))).distinct()
      val symJ = e0j
        .unionByName(e0j.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .repartition(s.sparkContext.defaultParallelism, col("dst"))
        .localCheckpoint()
      var labels = touchedJ.select(col("id"), col("id").as("component"))
        .localCheckpoint()
      var prevSum = java.math.BigDecimal.valueOf(Long.MaxValue)
      var iter = 0
      var converged = false
      val tj = System.nanoTime()
      while (!converged && iter < 20) {
        val viaEdges = symJ
          .join(labels, symJ("dst") === labels("id"))
          .select(symJ("src").as("id"), col("component"))
        val m = labels.select(col("id"), col("component"))
          .unionByName(viaEdges)
          .groupBy("id").agg(min("component").as("component"))
        var cur = m
        for (_ <- 1 to nJumps) {
          cur = cur
            .join(cur.select(col("id").as("cid"), col("component").as("jmp")),
              col("component") === col("cid"), "left")
            .select(col("id"),
              coalesce(col("jmp"), col("component")).as("component"))
        }
        val next = cur.localCheckpoint(false)
        val s2 = next.agg(sum(col("component")).cast("decimal(38,0)")).collect()(0)
          .getDecimal(0)
        converged = s2.compareTo(prevSum) == 0
        prevSum = s2
        labels = next
        iter += 1
      }
      println(f"JUMPROUNDS nJumps=$nJumps iters=$iter time=${(System.nanoTime() - tj) / 1e9}%.2f s")
    }

    val e0 = edges.localCheckpoint()
    val touched = e0.select(col("src").as("id"))
      .unionByName(e0.select(col("dst").as("id"))).distinct()
    val sym = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(s.sparkContext.defaultParallelism, col("dst"))
      .localCheckpoint()
    val t1 = System.nanoTime()
    val (plain, itersPlain) = plainCc(touched, sym, 500)
    println(f"PLAIN converged in $itersPlain rounds, ${(System.nanoTime() - t1) / 1e9}%.2f s")

    val diff = jump.toDF("id", "c1").join(plain.toDF("id", "c2"), Seq("id"), "full_outer")
      .filter(col("c1").isNull || col("c2").isNull || col("c1") =!= col("c2"))
      .count()
    println(s"DIFF=$diff")
    s.stop()
  }
}
