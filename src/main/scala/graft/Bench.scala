package graft

import org.apache.spark.sql.SparkSession

/** Bench entry: runs the query surface on SPARK_GRAFT_SF_DIR and prints the
  * per-query SPREAD map as one JSON line, then the timing summary as the
  * LAST line (compact, 2-decimal seconds). Two separate bounded lines —
  * not one giant one — because the driver records the process TAIL: r6's
  * artifact lost every timing to a single oversized line whose head (the
  * timings) was truncated away while its tail (the spread map) survived,
  * and was then misread as seconds. Optional env:
  *   SPARK_GRAFT_QUERIES=q01,q02  — run a subset (profiling aid)
  *   SPARK_GRAFT_RUNS=N           — base runs per query (default 2)
  *   SPARK_GRAFT_EXPLAIN=1        — print each formatted plan to stderr
  */
object Bench {
  /** Committed quiet-band sentinel median for this host class: the r9/r10
    * quiet runs measured sentinel series of 0.05–0.19 s with medians around
    * 0.08–0.12 s; the r10 contended post-close regeneration spiked to
    * 0.36 s. A run whose sentinel MEDIAN exceeds 2× this constant is
    * host-contended end-to-end, not just hit by one hiccup.
    */
  val QuietSentinelMedian = 0.12

  /** (median, contended) for a sentinel series. Self-labels contaminated
    * artifacts (r10 verdict: the post-close regeneration's 160 s total
    * needed a full manual adjudication that this stamp now replaces).
    * Median, not max — a single spike is normal scheduler jitter; a
    * shifted median means the whole sweep ran under contention.
    */
  def contentionStamp(series: Seq[Double]): (Double, Boolean) = {
    if (series.isEmpty) return (0.0, false)
    val s = series.sorted
    val median =
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    (median, median > 2.0 * QuietSentinelMedian)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // PrefixSum's offsets window (q06/q63) runs over #blocks rows by
    // design; Spark's blanket single-partition-window warning is noise
    // for it and would otherwise land in the recorded bench tail.
    org.apache.log4j.Logger
      .getLogger("org.apache.spark.sql.execution.window.WindowExec")
      .setLevel(org.apache.log4j.Level.ERROR)
    // clearCaches() below unpersists each query's localCheckpoint scratch
    // between queries; every RDD then logs a lineage-truncated WARN —
    // thousands of stderr lines per sweep for an intentional, documented
    // unpersist. Silence the RDD loggers only (not the SQL engine's).
    org.apache.log4j.Logger
      .getLogger("org.apache.spark.rdd")
      .setLevel(org.apache.log4j.Level.ERROR)
    val subset = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    val selected = SparkEntry.queries
      .filter { case (name, _) => subset.forall(_.exists(name.startsWith)) }
      .toSeq.sortBy(_._1)
    val selectedNames = selected.map(_._1).toSet
    // Uncounted warmup: pay JVM/codegen/shuffle-machinery startup here so
    // it isn't attributed to whichever query happens to run first, and
    // build the MEMOIZED CORPUS ARTIFACTS (cluster map, band index,
    // suffix ranks) — those are per-corpus state every consumer probes,
    // not any single query's work, and paying them inside some query's
    // first run is what produced r6's 2-3× spreads on q62b/q173/q174.
    // Each family warms only when a SELECTED query consumes its tables
    // (SPARK_GRAFT_QUERIES profiling runs skip unrelated builds), and a
    // warm-build failure defers to the consuming queries instead of
    // aborting the whole bench.
    locally {
      import org.apache.spark.sql.functions._
      spark.range(1000000).select(sum(col("id"))).collect()
      spark.range(100000).groupBy((col("id") % 7).as("k"))
        .count().orderBy("k").collect()
      import graft.operators._
      val families: Seq[(String, Set[String], () => Unit)] = Seq(
        ("dedup", Dedup.queries.keySet ++ Curation.queries.keySet,
          () => Dedup.warmArtifacts(spark, sfDir)),
        ("suffix", SuffixRank.queries.keySet,
          () => SuffixRank.warmArtifacts(spark, sfDir)),
        ("copurchase", GraphCore.queries.keySet ++ Triangles.queries.keySet,
          () => GraphCore.warmArtifacts(spark, sfDir)),
        ("wordcooc", TextRank.queries.keySet,
          () => TextRank.warmArtifacts(spark, sfDir)),
        ("anngraph", AnnGraph.queries.keySet,
          () => AnnGraph.warmArtifacts(spark, sfDir)))
      families.foreach { case (fam, consumers, warm) =>
        if (consumers.intersect(selectedNames).nonEmpty)
          try warm() catch { case e: Throwable =>
            System.err.println(
              s"[bench] warmup '$fam' failed (deferred to consumers): ${e.getMessage}")
          }
      }
    }
    // min of 2 runs per query: the first run pays that query's codegen /
    // JIT compilation (several seconds of constant overhead on the
    // multi-stage plans, 1.5–2× run-to-run noise on this host); the
    // minimum is the steady-state figure a recurring production job
    // sees, and is far more stable across bench invocations.
    val runsPerQuery = {
      val raw = sys.env.get("SPARK_GRAFT_RUNS")
      val parsed = raw.flatMap(_.toIntOption).filter(_ >= 1)
      if (raw.isDefined && parsed.isEmpty)
        System.err.println(
          s"[bench] ignoring invalid SPARK_GRAFT_RUNS=${raw.get}; using 2")
      parsed.getOrElse(2)
    }

    /** (min, ok, spread) from `times`: spread = 2nd-smallest/smallest —
      * over the two BEST runs, so a single scheduling hiccup absorbed by
      * the damper's extra run doesn't read as instability; genuine
      * bimodality (the two best runs disagreeing) still shows.
      */
    def summarize(times: Seq[(Double, Boolean)]): (Double, Boolean, Double) = {
      val ts = times.map(_._1).sorted
      val spread =
        if (ts.size >= 2) ts(1) / math.max(ts.head, 1e-9) else 1.0
      (ts.head, times.forall(_._2), spread)
    }

    // Contention sentinel (r8 verdict #5): a FIXED data-independent
    // micro-job measured on a cadence through the sweep. Its timing
    // series separates host contention from query regressions for a
    // reader without access to this box: a noisy sentinel explains a
    // noisy query; a quiet sentinel next to a slow query is a real
    // finding. spark.range is deterministic and corpus-free, so every
    // sentinel run does identical work.
    def runSentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 1L << 20, 1, 8)
        .selectExpr("sum(id * 3 % 7) as s").write
        .format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val sentinelSeries = scala.collection.mutable.ArrayBuffer.empty[Double]
    sentinelSeries += runSentinel() // JIT-warm the sentinel path itself
    sentinelSeries.clear()
    sentinelSeries += runSentinel()
    var sinceSentinel = 0

    /** Drop every persisted RDD (r11): the queries' localCheckpoints are
      * per-invocation scratch, but nothing ever unpersisted them, so the
      * block manager accumulated hundreds of cached RDDs over a
      * 231-query sweep — memory pressure that builds through the run and
      * lands on whichever queries execute late (the r11 sweep recorded
      * q120 at 6.5 s in-sweep vs 0.99 s isolated in the SAME JVM).
      * Called BETWEEN queries — after a query's last run, outside every
      * timed region — and never while a cross-query cache is live (memo
      * artifacts are saved TABLES, not cached RDDs; the scaling block's
      * derived-corpus frames are done with before its timed loop).
      */
    def clearCaches(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    val results = selected.map { case (name, fn) =>
      sinceSentinel += 1
      if (sinceSentinel >= 10) { sinceSentinel = 0; sentinelSeries += runSentinel() }
      def runOnce(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try {
            val df = fn(spark, sfDir)
            if (explain) { System.err.println(s"== $name"); df.explain("formatted") }
            // noop-format write: materializes EVERY output column (count()
            // would let Catalyst prune the projections, under-measuring
            // map-heavy queries) without paying for an output format.
            df.write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      var times = (1 to runsPerQuery).map(_ => runOnce())
      // Noise damper: with min-of-2, a query whose BOTH runs hit the same
      // scheduling hiccup (GC pause, JIT storm from a neighbor in this
      // 190+-query JVM) records a phantom 2–10× regression that vanishes
      // on re-measurement (r5 verdict: q52 2.28 s recorded vs 0.26 s on
      // rerun). When the base runs disagree by > 30%, the min itself is
      // suspect — pay ONE extra run and keep the overall min. The 0.05 s
      // floor only skips trivially-fast queries where a 30% swing is
      // milliseconds of scheduler jitter; r6's sub-0.5 s first-run
      // disagreements (q62b/q173/q174) now re-run too (r6 task 8).
      if (times.forall(_._2) && times.size >= 2) {
        val ts = times.map(_._1)
        if (ts.min >= 0.05 && ts.max / ts.min > 1.3) times :+= runOnce()
      }
      // If the damper's extra run DISAGREED with both base runs (both hit
      // the same hiccup, the rerun found the steady state), one fast run
      // stands alone and the 2nd-best/best spread still reads > 1.3 —
      // pay ONE more run to confirm it. Bounded: ≤ 4 runs, pathological
      // queries only.
      if (times.forall(_._2) && times.size == 3) {
        val sorted = times.map(_._1).sorted
        if (sorted.head >= 0.05 && sorted(1) / sorted.head > 1.3)
          times :+= runOnce()
      }
      val (min, ok, spread) = summarize(times)
      clearCaches() // free this query's checkpoints before the next one
      (name, min, ok, spread, times.map(_._1))
    }
    // Loader-path throughput: the production dataflow end-to-end (decode →
    // parse → salted repartition → rolling gzip objects on disk), timed as
    // its own entry — and run `runsPerQuery` times like every query (its
    // r6 spread was a hard-coded 1.0 that read as "perfectly stable" when
    // max/min was never measured).
    val loaderResult: Option[(String, Double, Boolean, Double, Seq[Double])] =
      if (subset.forall(_.exists("loader_batch_sink".startsWith))) Some {
        import org.apache.spark.sql.functions._
        def runLoader(): (Double, Boolean) = {
          val outDir = java.nio.file.Files.createTempDirectory("bench_loader").toString
          val t0 = System.nanoTime()
          val ok =
            try {
              val raw = graft.operators.Synth.events(spark, sfDir)
                .select(encode(graft.operators.Synth.enrichedLine(), "utf-8").as("value"))
              val cfg = graft.config.LoaderConfig.validate(graft.config.LoaderConfig(
                graft.config.Purpose.Enriched,
                graft.config.Output(s"file://$outDir/good"),
                graft.config.BadOutput(s"file://$outDir/bad")))
                .fold(e => throw new IllegalArgumentException(e), identity)
              val metrics = new graft.streaming.LoaderPipeline.Metrics
              graft.streaming.LoaderPipeline.runBatch(
                raw, cfg, new graft.sinks.HadoopBlobStore(Map.empty), metrics)
              require(metrics.count.get() > 0, "loader wrote no records")
              true
            } catch { case e: Throwable =>
              System.err.println(s"[bench] loader_batch_sink failed: ${e.getMessage}")
              false
            }
          ((System.nanoTime() - t0) / 1e9, ok)
        }
        val times = (1 to runsPerQuery).map(_ => runLoader())
        val (min, ok, spread) = summarize(times)
        ("loader_batch_sink", min, ok, spread, times.map(_._1))
      } else None

    val all = results ++ loaderResult
    // JVM-default-locale interpolators (f"$v%.2f") would emit `0,26` under
    // a comma-decimal locale and break the JSON — always Locale.ROOT
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def entries(f: ((String, Double, Boolean, Double, Seq[Double])) => String): Seq[String] =
      all.map { case t @ (k, _, _, _, _) => "\"" + k + "\":" + f(t) }
    val qEntries = entries { case (_, v, ok, _, _) => if (ok) num(v) else "\"failed\"" }
    val spEntries = entries { case (_, _, _, sp, _) => num(sp) }
    // all raw runs per query (r8 verdict #5): min-of-N alone cannot tell
    // a reader whether a slow figure was contention or regression
    val runEntries = entries { case (_, _, _, _, rs) =>
      rs.map(num).mkString("[", ",", "]") }
    val sentinelJson = sentinelSeries.map(num).mkString("[", ",", "]")

    // Isolated re-measurement of the 5 slowest queries (r8 verdict #9):
    // at the end of the sweep the JVM is fully warm and nothing else has
    // run for seconds — min-of-5 here is the closest this harness gets
    // to a contention-free figure, and it pins down whether a slow sweep
    // number was real. loader_batch_sink is EXCLUDED from selection
    // (r9 advice): this pass re-runs registry queries, and a no-op
    // stand-in for the loader would publish a fabricated ~0 s figure —
    // its own runs array above is the loader's record.
    val top5 = all.filter(_._3).filterNot(_._1 == "loader_batch_sink")
      .sortBy(-_._2).take(5).map(_._1)
    val top5Isolated = top5.map { name =>
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val ok = try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      clearCaches()
      name -> t.filter(_._2).map(_._1).minOption.getOrElse(-1.0)
    }
    val top5Json = top5Isolated
      .map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")

    // Scaling-curve evidence for the pair-generation families (r9
    // verdict #3): sf0.1 is the largest driver dataset, so the bench
    // DERIVES deterministic 2×/4×/8× corpora. Clone k of doc d keeps the
    // original doc's structure but suffixes every token with the clone
    // tag — within-clone similarity mirrors the original corpus exactly
    // while cross-clone shingles never collide, so near-dup DENSITY
    // stays constant and a linear-ish family must show linear-ish times
    // (cloning without perturbation would grow every dup cluster ×K and
    // pair counts ×K², faking superlinearity). Embedding clones rotate
    // the dimension order by 8k: within-clone dots are preserved (cells
    // re-block per clone), cross-clone dots decorrelate. Fixed /tmp
    // paths keep the memo-table GC bounded across runs (CorpusKey sweeps
    // superseded fingerprints under the same stem). One run per
    // (family, factor) — a diagnostic curve, not a headline figure; -1
    // marks a failure. SPARK_GRAFT_SCALING=0 or a query subset skips it.
    // q204 joins the families in r11: graph-ANN search cost is the
    // medoid entry fan-out (⌈n/256⌉ cells — sublinear) plus a CONSTANT
    // rounds·beamW·2M evaluation budget, so its curve should stay well
    // under linear once the index build is paid in the untimed warm
    // step like every other memoized artifact
    val scalingFamilies = Seq("q61_minhash_dedup", "q31b_prefix_jaccard",
      "q33c_simhash64_pairs", "q120_containment", "q195_semantic_dedup",
      "q187_incremental_clusters", "q204_knn_graph_beam")
    val scalingFactors = Seq(1, 2, 4, 8)
    val scalingSentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    val scaling: Seq[(String, Seq[Double])] =
      if (sys.env.get("SPARK_GRAFT_SCALING").contains("0") || subset.isDefined)
        Seq.empty
      else try {
        import org.apache.spark.sql.functions._
        val docs = graft.operators.Synth.documents(spark, sfDir)
          .select("doc_id", "text", "lang", "source").localCheckpoint()
        val embs = graft.operators.Synth.embeddings(spark, sfDir)
          .select("vec_id", "embedding", "label").localCheckpoint()
        val dirs = scalingFactors.map { f =>
          val dir = s"/tmp/graft_scaling/x$f"
          // ALL clones — including k=0 — go through the same id*8+k remap:
          // keeping the original ids for k=0 made clone 1 of doc 1 collide
          // with original doc 9 (~625 collisions per clone at sf0.1),
          // spuriously bridging original and clone clusters in the
          // id-keyed families (q187 union-find, q61, q195) — exactly the
          // density distortion the token perturbation exists to avoid
          // (r10 advice, medium). Applied uniformly at x1 too, so every
          // factor sees the same id space and curves stay comparable.
          (0 until f).map { k =>
            if (k == 0) docs.select((col("doc_id") * 8).as("doc_id"),
              col("text"), col("lang"), col("source"))
            else docs.select((col("doc_id") * 8 + k).as("doc_id"),
              expr("array_join(transform(split(trim(text), '\\\\s+'), " +
                s"t -> concat(t, '_c$k')), ' ')").as("text"),
              col("lang"), col("source"))
          }.reduce(_ unionByName _)
            .withColumn("n_chars", length(col("text")).cast("long"))
            .select("doc_id", "text", "lang", "source", "n_chars")
            .write.mode("overwrite").parquet(s"$dir/documents.parquet")
          (0 until f).map { k =>
            val off = (k * 8) % 64
            if (k == 0) embs.select((col("vec_id") * 8).as("vec_id"),
              col("embedding"), col("label"))
            else embs.select((col("vec_id") * 8 + k).as("vec_id"),
              expr(s"concat(slice(embedding, ${off + 1}, ${64 - off}), " +
                s"slice(embedding, 1, $off))").as("embedding"),
              col("label"))
          }.reduce(_ unionByName _)
            .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
          f -> dir
        }
        val perDir = dirs.map { case (f, dir) =>
          // per-point contention stamp (r11): the scaling points run at
          // the tail of a long sweep, where the steal band hits hardest —
          // one sentinel per factor lets a reader adjudicate a superlinear-
          // looking point without re-running it (the same instrument the
          // main sweep already carries)
          scalingSentinels += runSentinel()
          // memoized artifacts (cluster map, band index) are per-corpus
          // INDEX state — built untimed, as for the main sweep's warmup
          try graft.operators.Dedup.warmArtifacts(spark, dir)
          catch { case e: Throwable => System.err.println(
            s"[bench] scaling warm x$f failed: ${e.getMessage}") }
          try graft.operators.AnnGraph.warmArtifacts(spark, dir)
          catch { case e: Throwable => System.err.println(
            s"[bench] scaling anngraph warm x$f failed: ${e.getMessage}") }
          scalingFamilies.map { name =>
            // min-of-2 like the main sweep: a single-run point showed
            // 1.7× contention noise (r10: q31b 8× measured 8.51 s and
            // 14.17 s for identical work across two runs)
            def once(): Double = {
              val t0 = System.nanoTime()
              try {
                SparkEntry.queries(name)(spark, dir)
                  .write.format("noop").mode("overwrite").save()
                (System.nanoTime() - t0) / 1e9
              } catch { case e: Throwable =>
                System.err.println(
                  s"[bench] scaling $name x$f failed: ${e.getMessage}")
                -1.0
              }
            }
            val (a, b) = (once(), once())
            clearCaches() // per-query scratch; the scaling corpora are
            // parquet DIRS and the memo artifacts tables — both survive
            name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
          }.toMap
        }
        scalingFamilies.map(n => n -> perDir.map(_(n)))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] scaling harness failed: ${e.getMessage}")
        Seq.empty
      }
    val scalingJson =
      s"""{"factors":[${scalingFactors.mkString(",")}],""" +
        s""""sentinels":[${scalingSentinels.map(num).mkString(",")}],""" +
        """"families":{""" +
        scaling.map { case (n, ts) =>
          "\"" + n + "\":[" + ts.map(num).mkString(",") + "]"
        }.mkString(",") + "}}"
    // failed queries are excluded from the total AND flagged — a crash must
    // never read as a speedup
    val total = all.collect { case (_, v, true, _, _) => v }.sum
    val failed = all.count(!_._3)

    // The driver records only the process TAIL and json-parses the last
    // line. r6/r7 both lost timings to oversized lines (r7: one ~5 KB
    // summary line, truncated mid-map — 126 of 205 timings gone). So:
    // (1) every map is chunked into ≤ ~2 KB lines, (2) the LAST line is
    // a SHORT all-scalar totals line that always survives and parses,
    // (3) the complete single-object artifact goes to a file for full
    // fidelity regardless of tail size.
    def chunks(es: Seq[String], cap: Int = 1800): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[StringBuilder]
      es.foreach { e =>
        if (out.isEmpty || out.last.length + e.length + 1 > cap)
          out += new StringBuilder(e)
        else out.last.append(',').append(e)
      }
      out.map(_.result()).toSeq
    }
    def emitChunked(metric: String, key: String, es: Seq[String]): Int = {
      val cs = chunks(es)
      cs.zipWithIndex.foreach { case (c, i) =>
        println(s"""{"metric":"${metric}_${i + 1}of${cs.size}","$key":{$c},"sf":"$sfDir"}""")
      }
      cs.size
    }
    val (sentinelMedian, contended) = contentionStamp(sentinelSeries.toSeq)
    if (contended) System.err.println(
      s"[bench] CONTENDED run: sentinel median ${num(sentinelMedian)} s > " +
        s"2x quiet band ${num(QuietSentinelMedian)} s — timings unreliable")
    val fullJson =
      s"""{"metric":"bench","value":${num(total)},"unit":"sec","failed":$failed,""" +
        s""""runs_per_query":$runsPerQuery,"n_queries":${all.size},""" +
        s""""contended":$contended,"sentinel_median":${num(sentinelMedian)},""" +
        s""""queries":{${qEntries.mkString(",")}},""" +
        s""""spread":{${spEntries.mkString(",")}},""" +
        s""""runs":{${runEntries.mkString(",")}},""" +
        s""""sentinel":$sentinelJson,""" +
        s""""top5_isolated":$top5Json,""" +
        s""""scaling":$scalingJson,"sf":"$sfDir"}"""
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
      (fullJson + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $fullPath: ${e.getMessage}")
    }
    emitChunked("spread", "spread", spEntries)
    emitChunked("queries", "queries", qEntries)
    // sentinel + top5 print BEFORE the tail block below: they are
    // diagnostics, not the record — anything after this point is sized
    // to survive the driver's real capture window
    println(s"""{"metric":"sentinel","series":$sentinelJson,"sf":"$sfDir"}""")
    println(s"""{"metric":"top5_isolated","queries":$top5Json,"sf":"$sfDir"}""")
    println(s"""{"metric":"scaling","value":$scalingJson,"sf":"$sfDir"}""")
    // Tail-proof rendering, round 3 (r9 verdict #4): the driver's REAL
    // capture window measured 2000 chars (r9 artifact) — including sbt's
    // "[info] " prefixes and its trailing "[success] ..." line (~75
    // chars), so the short-key name:value copy (~2.5 KB) could never
    // fully fit and chunk 1of2 was truncated in r7, r8 AND r9. What DOES
    // fit: a POSITIONAL centisecond array over the canonical entry order
    // (query names sorted ascending, loader_batch_sink last — the same
    // order as every map in this output and the artifact) is ~1 KB for
    // 220 entries. It prints immediately before the totals line, so the
    // last ~1.3 KB of the log reconstructs every entry exactly; the
    // name-keyed chunks above and the artifact file carry the names.
    // -1 centiseconds marks a failed query (never a timing).
    val shortOf: Map[String, String] = {
      val cands = all.map { case (k, _, _, _, _) => k -> k.takeWhile(_ != '_') }
      val collide = cands.groupBy(_._2).filter(_._2.size > 1).keySet
      cands.map { case (k, sh) => k -> (if (collide(sh)) k else sh) }.toMap
    }
    val qShort = all.map { case (k, v, ok, _, _) =>
      "\"" + shortOf(k) + "\":" + (if (ok) num(v) else "\"failed\"") }
    val nChunks = emitChunked("queries_short", "queries", qShort)
    val qcs = all.map { case (_, v, ok, _, _) =>
      if (ok) math.round(v * 100).toString else "-1" }
    // 900-char cap: even at double today's query count the qcs block +
    // totals line + sbt's success line stay inside a 2000-char capture
    val csChunks = chunks(qcs, cap = 900)
    csChunks.zipWithIndex.foreach { case (c, i) =>
      println(s"""{"metric":"qcs_${i + 1}of${csChunks.size}","unit":"centisec",""" +
        s""""order":"name-sorted+loader","v":[$c]}""")
    }
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","failed":$failed,""" +
      s""""runs_per_query":$runsPerQuery,"n_queries":${all.size},"contended":$contended,""" +
      s""""query_chunks":$nChunks,"full_artifact":"$fullPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
