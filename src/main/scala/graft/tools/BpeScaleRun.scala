package graft.tools

import graft.core.{GraftSession, Tables}
import graft.ext.Bpe

/** Pins the realistic-tokenizer BPE number (VERDICT r6 item 5): a real
  * tokenizer needs thousands of merges, not the 64 the q120 contract
  * proves, and the cost model that matters at scale is DRIVER ROUND
  * TRIPS × corpus passes — each batched round is one bounded collect
  * (the windowSize pair frequencies) plus one distributed rebuild of the
  * word-frequency frame (vocabulary-sized, never the corpus: the corpus
  * is tokenized once up front). Run:
  *
  *   sbt "runMain graft.tools.BpeScaleRun /root/testdata/sf0.1 1024 64 512 bigrams"
  *
  * Prints one JSON line {merges, rounds, wall_sec, ...}; the result is
  * recorded in SCALE.md.
  *
  * Corpus modes: the raw fixture has a 31-word vocabulary, so plain BPE
  * EXHAUSTS at ~91 merges (every word becomes one token — measured, and
  * the correct algorithmic outcome). `bigrams` mode rewrites each doc as
  * its adjacent-word bigrams joined with '_' (vocab ≈ 31² ≈ 960 words of
  * ~10 chars), putting the run in the realistic >1k-merge regime while
  * staying a pure deterministic derivation of the fixture. */
object BpeScaleRun {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val target = args.lift(1).map(_.toInt).getOrElse(1024)
    val batchSize = args.lift(2).map(_.toInt).getOrElse(64)
    val windowSize = args.lift(3).map(_.toInt).getOrElse(512)
    val mode = args.lift(4).getOrElse("bigrams")
    require(mode == "words" || mode == "bigrams", s"bad mode $mode")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]",
      GraftSession.shufflePartitionsFor(GraftSession.inputBytes(sfDir), cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = Tables(spark, sfDir).documents
    val docs =
      if (mode == "words") raw
      else raw.select(concat_ws(" ", expr(
        "transform(sequence(1, size(split(lower(text), ' ')) - 1), i -> " +
          "concat(split(lower(text), ' ')[i - 1], '_', " +
          "split(lower(text), ' ')[i]))")).as("text"))
    // rounds cap sized from the target with slack for interaction-thinned
    // rounds; exhaustion (empty window) stops earlier on small corpora
    val roundsCap = math.max(4, (target * 2) / batchSize)
    val t0 = System.nanoTime()
    val run = Bpe.trainBatched(docs, rounds = roundsCap,
      batchSize = batchSize, windowSize = windowSize)
    // force the rules frame (the training loop is already materialized by
    // the per-round collects; this pins the final frame too)
    val nRules = run.rules.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val perRound = run.mergesLearned.toDouble / math.max(run.roundsRun, 1)
    println(s"""{"metric":"bpe_scale","sf":"$sfDir","mode":"$mode","target_merges":$target,""" +
      s""""merges_learned":${run.mergesLearned},"rules_rows":$nRules,""" +
      s""""rounds":${run.roundsRun},"batch_size":$batchSize,""" +
      s""""window_size":$windowSize,"merges_per_round":$perRound,""" +
      s""""wall_sec":$wall}""")
    spark.stop()
    if (run.mergesLearned < target)
      System.err.println(s"[bpe-scale] WARNING: learned ${run.mergesLearned} < target $target (corpus exhausted or rounds capped)")
  }
}
