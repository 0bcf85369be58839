package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond dedup: the sampling / splitting /
  * contamination-scoring passes a training-data pipeline runs after the
  * corpus is cleaned.
  *
  *  - q64: language-balanced temperature resampling — the standard
  *    multilingual-corpus rebalance (keep rate ∝ (c_min/c_lang)^α with
  *    α = 0.5). Selection is a deterministic salted-md5 uniform compared
  *    against a per-language integer threshold, so it is reproducible
  *    run-to-run AND oracle-checkable: sqrt and double division are
  *    IEEE-754 correctly-rounded in both engines, ×2^32 is an exact
  *    exponent shift, and the final compare is integer vs integer.
  *  - q65: leakage-safe train/val/test split — hash the GROUP key
  *    (source), not the row, so every document from one source lands in
  *    the same split. Splitting by row leaks near-identical documents
  *    across the eval boundary; splitting by group is the fix every
  *    dataset card asks about.
  *  - q66: contamination scoring — q36's boolean decontamination refined
  *    to a per-document fraction of token-3-gram shingles found in the
  *    eval set, so downstream can threshold instead of hard-dropping.
  *
  * Scale shape: all three are map-only over the corpus except one tiny
  * broadcast each (per-language thresholds — |langs| rows; the eval
  * shingle set — benchmarks are KBs while the corpus is TBs). Nothing
  * shuffles the 100 TB side.
  */
object Curation {

  /** Salted 32-bit uniform from a row key — first 8 md5 hex digits as an
    * integer in [0, 2^32). Identical construction in the DuckDB oracle.
    */
  private def u32Spark(salt: String, key: String): String =
    s"cast(conv(substring(md5(cast(concat('$salt', $key) as binary)), 1, 8), 16, 10) as bigint)"

  private def u32Duck(salt: String, key: String): String =
    s"cast(('0x' || substring(md5('$salt' || $key), 1, 8)) as bigint)"

  /** α = 0.5: keep rate per language = sqrt(c_min / c_lang). */
  private val TwoPow32 = "4294967296.0"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Temperature resampling: per-language keep thresholds from the
    // language histogram (tiny, broadcast), then one map-only pass keeps
    // doc iff u32(doc) < floor(sqrt(c_min/c_lang) * 2^32). The rarest
    // language keeps everything; the head language is downsampled toward
    // balance.
    "q64_temperature_resample" -> { (s, dir) =>
      val d = Synth.documents(s, dir)
      val counts = d.groupBy("lang").agg(count(lit(1)).as("c"))
      val thresholds = counts
        .crossJoin(counts.agg(min(col("c")).as("cmin")))
        .withColumn("thresh",
          floor(sqrt(col("cmin").cast("double") / col("c").cast("double"))
            * expr(TwoPow32)).cast("bigint"))
        .select("lang", "thresh")
      d.select(col("doc_id"), col("lang"))
        .withColumn("sample_u",
          expr(u32Spark("resample:", "cast(doc_id as string)")))
        .join(broadcast(thresholds), "lang")
        .filter(col("sample_u") < col("thresh"))
        .select("doc_id", "lang", "sample_u")
        .orderBy("doc_id")
    },

    // Leakage-safe split: the md5 of the SOURCE decides, so co-sourced
    // documents can never straddle train/eval. Hex-string thresholds
    // ('cccc' = 0.8·16^4, 'e666' ≈ 0.9·16^4) keep the compare exact.
    "q65_group_split" -> { (s, dir) =>
      Synth.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .withColumn("grp_key",
          expr("substring(md5(cast(concat('split:', source) as binary)), 1, 4)"))
        .withColumn("split", expr(
          "CASE WHEN grp_key < 'cccc' THEN 'train' " +
            "WHEN grp_key < 'e666' THEN 'val' ELSE 'test' END"))
        .select("doc_id", "source", "grp_key", "split")
        .orderBy("doc_id")
    },

    // Contamination score: |doc shingles ∩ eval shingles| / |doc
    // shingles| per training doc (eval set = doc_id ≡ 0 mod 97, as q36).
    // The eval shingle set broadcasts; the corpus side is explode +
    // map-side hash-join + re-aggregate on doc_id — shuffle bounded by
    // |corpus shingles|, never pairwise.
    "q66_contamination_score" -> { (s, dir) =>
      val isEval = col("doc_id") % 97 === 0
      val sh = Dedup.shingled(s, dir)
      val evalSh = sh.filter(isEval)
        .select(explode(col("sh")).as("shingle")).distinct()
        .withColumn("hit", lit(1))
      sh.filter(!isEval)
        .select(col("doc_id"), expr("size(sh)").as("n_sh"),
          explode(col("sh")).as("shingle"))
        .join(broadcast(evalSh), Seq("shingle"), "left")
        .groupBy("doc_id", "n_sh")
        .agg(count(col("hit")).as("n_hit"))
        .withColumn("contamination",
          col("n_hit").cast("double") / col("n_sh").cast("double"))
        .select("doc_id", "n_sh", "n_hit", "contamination")
        .orderBy("doc_id")
    }
  )

  def oracle: Map[String, String] = Map(
    "q64_temperature_resample" ->
      s"""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
         |m AS (SELECT min(c) AS cmin FROM c),
         |r AS (
         |  SELECT lang,
         |    cast(floor(sqrt(cast(cmin as double) / cast(c as double))
         |      * $TwoPow32) as bigint) AS thresh
         |  FROM c, m)
         |SELECT d.doc_id AS doc_id, d.lang AS lang,
         |  ${u32Duck("resample:", "cast(d.doc_id as varchar)")} AS sample_u
         |FROM documents d JOIN r ON d.lang = r.lang
         |WHERE ${u32Duck("resample:", "cast(d.doc_id as varchar)")} < r.thresh
         |ORDER BY doc_id""".stripMargin,

    "q65_group_split" ->
      """SELECT doc_id, source,
        | substring(md5('split:' || source), 1, 4) AS grp_key,
        | CASE WHEN substring(md5('split:' || source), 1, 4) < 'cccc' THEN 'train'
        |   WHEN substring(md5('split:' || source), 1, 4) < 'e666' THEN 'val'
        |   ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q66_contamination_score" ->
      s"""WITH shs AS (SELECT doc_id, ${Dedup.dShingles} AS sh FROM documents),
         |ev AS (
         |  SELECT DISTINCT unnest(sh) AS shingle FROM shs WHERE doc_id % 97 = 0),
         |tr AS (
         |  SELECT doc_id, cast(len(sh) as int) AS n_sh, unnest(sh) AS shingle
         |  FROM shs WHERE doc_id % 97 <> 0)
         |SELECT tr.doc_id AS doc_id, tr.n_sh AS n_sh,
         |  cast(count(ev.shingle) as bigint) AS n_hit,
         |  cast(count(ev.shingle) as double) / tr.n_sh AS contamination
         |FROM tr LEFT JOIN ev ON tr.shingle = ev.shingle
         |GROUP BY tr.doc_id, tr.n_sh
         |ORDER BY doc_id""".stripMargin
  )
}
