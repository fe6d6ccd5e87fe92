package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** VERDICT r7 #4: the PQ/IVFADC stack parameterized past the fixture's
  * 8×8 geometry. Pins the `subs` parameter end to end at a non-default
  * width (dim 128 → 16 subspaces; the 768/96 production width runs in the
  * ScaleRehearsal sim768 leg) — build caches keyed by (corpus, subs),
  * codes arrays at the new length, and the broadcast-LUT and shuffle-LUT
  * batch probes agreeing EXACTLY, which exercises the literal-codebook
  * projection and dense-offset indexing at a width the registered
  * queries never reach. The expansion is two per-block-scaled copies of
  * each 64-dim vector, so cosine geometry (and the expected top-k) is
  * preserved from the fixture. */
class PqWidthSpec extends SparkSpec {

  test("dim-128 / 16-subspace build + both batch-probe paths agree") {
    val dir = tmpDir()
    Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
        expr("flatten(transform(sequence(0, 1), " +
          "j -> transform(embedding, x -> CAST(x * (1.0 + j * 0.5) AS FLOAT))))")
          .as("embedding"),
        col("label"))
      .write.parquet(s"$dir/embeddings.parquet")

    val codes = ProductQuant.pqCodes(spark, dir, subs = 16)
    val lens = codes.select(size(col("codes"))).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(lens == Seq(16), s"codes arrays should have 16 entries, got $lens")

    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val viaBroadcast = ProductQuant.ivfadcTopKAll(spark, dir, queries, k = 5,
      shortlist = 30, lists = 4, probe = 2, broadcastLut = Some(true), subs = 16)
      .collect().map(_.toString).toSeq
    val viaShuffle = ProductQuant.ivfadcTopKAll(spark, dir, queries, k = 5,
      shortlist = 30, lists = 4, probe = 2, broadcastLut = Some(false), subs = 16)
      .collect().map(_.toString).toSeq
    assert(viaBroadcast.nonEmpty)
    assert(viaBroadcast == viaShuffle,
      "broadcast-LUT and shuffle-LUT paths diverged at dim 128 / subs 16")
    // Force the large-width LUT builder (the table-derived collect that the
    // sim768 leg needs — the literal projection OOMs past ~512 codebook
    // rows) and pin it to the same answer.
    val viaTableLut = ProductQuant.ivfadcTopKAll(spark, dir, queries, k = 5,
      shortlist = 30, lists = 4, probe = 2, broadcastLut = Some(false), subs = 16,
      maxLiteralLut = 0)
      .collect().map(_.toString).toSeq
    assert(viaBroadcast == viaTableLut,
      "table-derived shuffle LUT diverged from the broadcast path")

    // AUTO selection (VERDICT r8 #4): broadcastLut = None derives the path
    // from the driver-known LUT bound |batch| × nprobe × |codebook|. With
    // the default threshold this 5-query batch picks broadcast; with the
    // threshold forced to 0 it derives the shuffle path. Both must plan
    // the expected physical shape AND return the forced paths' rows.
    val autoSmall = ProductQuant.ivfadcTopKAll(spark, dir, queries, k = 5,
      shortlist = 30, lists = 4, probe = 2, subs = 16)
    val autoSmallRows = autoSmall.collect().map(_.toString).toSeq
    assert(autoSmallRows == viaBroadcast, "auto (small batch) diverged")
    assert(!autoSmall.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
      "auto should pick the broadcast-LUT path for a bounded batch")
    val autoBig = ProductQuant.ivfadcTopKAll(spark, dir, queries, k = 5,
      shortlist = 30, lists = 4, probe = 2, subs = 16, maxBroadcastLutRows = 0L)
    val autoBigRows = autoBig.collect().map(_.toString).toSeq
    assert(autoBigRows == viaBroadcast, "auto (forced-over-threshold) diverged")
    assert(autoBig.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
      "auto past the threshold should derive the list_id shuffle join")
  }
}
