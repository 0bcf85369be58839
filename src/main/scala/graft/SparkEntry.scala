package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query + DuckDB oracle. Each
  * sub-registry lives with its operator family:
  *   - RefQueries    — SURVEY §2.11 Q1–Q8 (reference pipeline semantics)
  *   - Relational    — joins / aggs / windows / sorts / set-ops surface
  *   - TextAnalysis  — lang-id, quality, token counts, fingerprints
  *   - Dedup         — exact, n-gram Jaccard, MinHash LSH, SimHash, embedding
  *   - Similarity    — brute-force + LSH ANN over embeddings
  *   - Multimodal    — binary-column plumbing (decode stubbed)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q10_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ Relational.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ KMeans.queries ++
      Multimodal.queries ++ Curation.queries ++ RangeJoin.queries ++
      ProductQuantization.queries ++ PageRank.queries ++ ZOrder.queries ++
      Triangles.queries ++ Perceptron.queries ++ SuffixRank.queries ++
      Drift.queries ++ Spectral.queries ++ TextRank.queries ++ LabelProp.queries ++ CorpusStats.queries ++ Series.queries ++
      GraphCore.queries ++ Frontier.queries ++ Placement.queries ++
      AnnGraph.queries ++ BpeTrain.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RefQueries.oracle ++ Relational.oracle ++ TextAnalysis.oracle ++
      Dedup.oracle ++ Similarity.oracle ++ KMeans.oracle ++
      Multimodal.oracle ++ Curation.oracle ++ RangeJoin.oracle ++
      ProductQuantization.oracle ++ PageRank.oracle ++ ZOrder.oracle ++
      Triangles.oracle ++ Perceptron.oracle ++ SuffixRank.oracle ++
      Drift.oracle ++ Spectral.oracle ++ TextRank.oracle ++ LabelProp.oracle ++ CorpusStats.oracle ++ Series.oracle ++
      GraphCore.oracle ++ Frontier.oracle ++ Placement.oracle ++
      AnnGraph.oracle ++ BpeTrain.oracle
}
