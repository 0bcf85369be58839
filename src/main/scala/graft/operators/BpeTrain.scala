package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge TRAINING (Sennrich et al. 2016) — tokenizer induction at
  * corpus scale, one tier above q58's BPE *application*: learn the
  * top-`nMerges` byte-pair merges from the corpus word-frequency table.
  *
  * The production shape: ONE corpus pass builds the word→frequency
  * vocabulary (the only corpus-sized work — at 100 TB this is a single
  * map-side-combinable aggregation), then every training round runs on
  * the vocab table alone (bounded: |vocab| ≪ corpus). Round r:
  *
  *  1. adjacent-symbol pair counts, frequency-weighted — a vocab-sized
  *     explode + groupBy (map-side combinable);
  *  2. best pair = argmax by (count desc, left asc, right asc) —
  *     orderBy+limit 1, a TakeOrdered, never a single-partition window;
  *  3. merge the pair in every word: words are SPACED-SYMBOL STRINGS
  *     (` h i s `) and the merge is 6 fixed passes of literal
  *     `replace(s, ' a b ', ' ab ')`. replace() is leftmost
  *     non-overlapping in both engines, and each pass halves any
  *     remaining alternating chain, so 6 passes reach fixpoint for any
  *     word up to 64 symbols — and because BOTH engines run the SAME
  *     fixed passes, cross-engine equality holds unconditionally, not
  *     just at fixpoint. The best pair rides a 1-row broadcast (the
  *     q168/q199 pattern), so the merge pass is map-only.
  *
  * Each round's vocab is localCheckpointed: v_{r+1} depends on v_r twice
  * (pair counts AND the merge), and without the cut the recomputed
  * lineage doubles per round. Output: the learned merge table
  * (mrank, lhs, rhs, merged, pair_count) — exact integers and strings,
  * hash-checked against a DuckDB oracle that replays all rounds as
  * unrolled CTEs.
  */
object BpeTrain {

  private val nMerges = 8
  private val replacePasses = 6

  private def spacedSpark(tok: String): String =
    s"concat(' ', regexp_replace($tok, '(.)', '$$1 '))"
  private def spacedDuck(tok: String): String =
    s"' ' || regexp_replace($tok, '(.)', '\\1 ', 'g')"

  private def mergeExpr(passes: Int): String =
    (1 to passes).foldLeft("s") { (e, _) =>
      s"replace($e, concat(' ', a, ' ', b, ' '), concat(' ', a, b, ' '))"
    }
  private def mergeDuck(passes: Int): String =
    (1 to passes).foldLeft("s") { (e, _) =>
      s"replace($e, ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ')"
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q207_bpe_train" -> { (s, dir) =>
      val vocab0 = Synth.documents(s, dir)
        .select(explode(expr(Dedup.toks)).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("freq"))
        .select(expr(spacedSpark("tok")).as("s"), col("freq"))
        .localCheckpoint()
      val merges = Seq.newBuilder[DataFrame]
      var v = vocab0
      for (rank <- 1 to nMerges) {
        val pairs = v
          .select(col("freq"), expr("split(trim(s), ' ')").as("syms"))
          .filter(expr("size(syms) >= 2"))
          .select(col("freq"),
            explode(expr("transform(sequence(1, size(syms) - 1), " +
              "i -> struct(element_at(syms, i) as a, " +
              "element_at(syms, i + 1) as b))")).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("freq")).as("cnt"))
        // NOT checkpointed: the TakeOrderedAndProject shape is what marks
        // this side bounded for the plan lint; it recomputes once for the
        // output row, over the checkpointed v — vocab-sized, K rounds
        val best = pairs
          .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        merges += best.select(lit(rank).as("mrank"), col("a").as("lhs"),
          col("b").as("rhs"), concat(col("a"), col("b")).as("merged"),
          col("cnt").as("pair_count"))
        v = v.crossJoin(broadcast(best.select("a", "b")))
          .select(expr(mergeExpr(replacePasses)).as("s"), col("freq"))
          .localCheckpoint() // v_{r+1} is read twice next round
      }
      merges.result().reduce(_ unionByName _).orderBy("mrank")
    }
  )

  def oracle: Map[String, String] = Map(
    "q207_bpe_train" -> {
      val rounds = (1 to nMerges).map { r =>
        val prev = s"v${r - 1}"
        s"""p$r AS (
           | SELECT u.a AS a, u.b AS b, cast(sum(freq) as bigint) AS cnt
           | FROM (
           |  SELECT freq, unnest(list_transform(
           |    generate_series(1, len(syms) - 1),
           |    i -> {'a': syms[i], 'b': syms[i + 1]})) AS u
           |  FROM (SELECT freq,
           |    list_filter(string_split(trim(s), ' '), x -> x <> '') AS syms
           |   FROM $prev)
           |  WHERE len(syms) >= 2)
           | GROUP BY 1, 2),
           |best$r AS (
           | SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
           |v$r AS (
           | SELECT ${mergeDuck(replacePasses)} AS s, freq
           | FROM $prev, best$r)""".stripMargin
      }.mkString(",\n")
      val out = (1 to nMerges)
        .map(r => s"SELECT $r AS mrank, a AS lhs, b AS rhs, " +
          s"a || b AS merged, cnt AS pair_count FROM best$r")
        .mkString("\nUNION ALL ")
      s"""WITH v0 AS (
         | SELECT ${spacedDuck("tok")} AS s,
         |  cast(count(*) as bigint) AS freq
         | FROM (SELECT unnest(${Dedup.dToks}) AS tok FROM documents)
         | WHERE tok <> '' GROUP BY 1),
         |$rounds
         |$out
         |ORDER BY mrank""".stripMargin
    }
  )
}
