package graft.ext

import graft.SparkSpec

/** VERDICT r6 #5: build-artifact memos must key on corpus CONTENT, not the
  * directory path — an in-place regeneration of the source parquet has to
  * miss every cache and rebuild, never serve stale centroids/codebooks. */
class ArtifactVersionSpec extends SparkSpec {

  test("in-place corpus regeneration misses the IVF build cache") {
    val dir = tmpDir()
    val src = graft.Tables(spark, sf, "embeddings")
    src.write.parquet(s"$dir/embeddings.parquet")
    val v1 = Similarity.corpusVersion(dir)
    val root1 = Similarity.ivfBuild(spark, dir)

    // Regenerate IN PLACE (same path, different content — the stale-cache
    // scenario): fewer rows, so centroids genuinely differ too.
    src.limit(300).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val v2 = Similarity.corpusVersion(dir)
    assert(v2 != v1, "fingerprint must change when the corpus is rewritten")

    val root2 = Similarity.ivfBuild(spark, dir)
    assert(root2 != root1, "regenerated corpus must build a fresh artifact root")
    // The fresh root is a real, readable build over the NEW corpus.
    val assigned = graft.ops.SnapshotTable.read(spark, s"$root2/assignments")
    assert(assigned.count() == 300)
  }

  test("in-place corpus regeneration misses the PQ codebook cache") {
    val dir = tmpDir()
    val src = graft.Tables(spark, sf, "embeddings")
    src.write.parquet(s"$dir/embeddings.parquet")
    val root1 = ProductQuant.pqBuild(spark, dir)

    src.limit(300).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val root2 = ProductQuant.pqBuild(spark, dir)
    assert(root2 != root1, "regenerated corpus must retrain the codebooks")
    val codes = graft.ops.SnapshotTable.read(spark, s"$root2/codes")
    assert(codes.count() == 300)
  }

  test("in-place corpus regeneration misses the IVFADC cache") {
    val dir = tmpDir()
    val src = graft.Tables(spark, sf, "embeddings")
    src.write.parquet(s"$dir/embeddings.parquet")
    val root1 = ProductQuant.ivfadcBuild(spark, dir)

    src.limit(300).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val root2 = ProductQuant.ivfadcBuild(spark, dir)
    assert(root2 != root1, "regenerated corpus must rebuild the residual index")
    val codes = graft.ops.SnapshotTable.read(spark, s"$root2/codes")
    assert(codes.count() == 300)
  }
}
