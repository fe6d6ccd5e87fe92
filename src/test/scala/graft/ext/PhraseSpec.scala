package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Positional-index contract on a planted corpus: exact phrase occurrence
  * counts (incl. OVERLAPPING occurrences and repeated-term phrases), no row
  * for non-matching (phrase, doc) pairs, proximity window semantics, and
  * the probe plan reading positions — never re-tokenizing text. */
class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private val corpusRows = Seq(
    (1L, "alpha beta gamma alpha beta"),   // "alpha beta" ×2
    (2L, "beta alpha beta alpha"),         // "alpha beta" ×1 (at pos 1)
    (3L, "go go go stop"),                 // "go go" ×2 — OVERLAPPING
    (4L, "alpha gamma beta"),              // near miss: not adjacent
    (5L, "alpha beta gamma delta"))        // trigram lives here only

  private def mkCorpus(): String = {
    val dir = tmpDir()
    corpusRows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("phrase occurrences: overlap, repeated terms, strict adjacency") {
    val dir = mkCorpus()
    val got = Phrase.phraseMatch(spark, dir, Seq(
        10L -> Seq("alpha", "beta"),
        20L -> Seq("go", "go"),
        30L -> Seq("alpha", "beta", "gamma"),
        40L -> Seq("absent", "beta")))
      .collect()
      .map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_occ"))).toSet
    assert(got == Set(
      (10L, 1L, 2L), (10L, 2L, 1L), (10L, 5L, 1L), // doc 4 is a near miss
      (20L, 3L, 2L),                               // overlapping "go go"
      (30L, 1L, 1L), (30L, 5L, 1L)))               // phrase 40: no rows at all
  }

  test("proximity window: unordered, distinct positions, window-bounded") {
    val dir = mkCorpus()
    // alpha/gamma within 2: doc1 (2,0? gamma@2 alpha@0 d=2; alpha@3 d=1),
    // doc4 (d=1), doc5 (d=2 via alpha@0..gamma@2). Window 1 keeps only
    // adjacent pairs.
    val w2 = Phrase.proximityMatch(spark, dir,
        Seq((1L, "alpha", "gamma")), window = 2).collect()
      .map(r => (r.getAs[Long]("pair_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pairs"))).toSeq
    val w1 = Phrase.proximityMatch(spark, dir,
        Seq((1L, "alpha", "gamma")), window = 1).collect()
      .map(r => (r.getAs[Long]("pair_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pairs"))).toSeq
    // doc1: alpha@{0,3}, gamma@2 -> |0-2|=2, |3-2|=1 -> 2 pairs (w=2), 1 (w=1)
    // doc4: alpha@0, gamma@1 -> 1 pair both windows
    // doc5: alpha@0, gamma@2 -> 1 pair (w=2), 0 (w=1)
    assert(w2 == Seq((1L, 3L, 4L)), s"window 2: $w2")
    assert(w1 == Seq((1L, 2L, 2L)), s"window 1: $w1")
  }

  test("incrementally appended positions == cold build; replayed drop swallowed") {
    val dir = mkCorpus()
    val idx = tmpDir() + "/posidx"
    val (a, b) = corpusRows.partition(_._1 <= 3L)
    Phrase.positionsAppend(spark, idx, a.toDF("doc_id", "text"), 0L)
    Phrase.positionsAppend(spark, idx, b.toDF("doc_id", "text"), 1L)
    // replayed drop: a double-applied append would double docs 4-5's
    // position lists and corrupt every anchor count
    Phrase.positionsAppend(spark, idx, b.toDF("doc_id", "text"), 1L)
    val phrases = Seq(10L -> Seq("alpha", "beta"), 20L -> Seq("go", "go"))
    val inc = Phrase.phraseMatchAt(spark, idx, phrases).collect().map(_.toString).toSeq
    val cold = Phrase.phraseMatch(spark, dir, phrases).collect().map(_.toString).toSeq
    assert(inc == cold, s"incremental index diverged:\n$inc\nvs\n$cold")
    val posRows = graft.ops.SnapshotTable.read(spark, s"$idx/positions").count()
    val coldRows = graft.ops.SnapshotTable
      .read(spark, s"${Phrase.positionsBuild(spark, dir)}/positions").count()
    assert(posRows == coldRows, "replayed drop double-appended position rows")
  }

  test("streamed positional ingest == cold build; replay swallowed") {
    val dir = mkCorpus()
    val base = tmpDir()
    val idx = s"$base/posidx"
    val shardDir = s"$base/shard"
    def writeShard(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = new java.io.File(tmpDir(), "w")
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(shardDir)
      dst.mkdirs()
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dst, s"$name.parquet").toPath)
    }
    def runStream(ckpt: String): Unit = {
      val src = spark.readStream.schema("doc_id LONG, text STRING")
        .parquet(s"$shardDir/*.parquet")
      val q = graft.streaming.Streams.phraseIndexIngestSink(src, idx, ckpt).start()
      q.awaitTermination()
    }
    val (a, b) = corpusRows.map(r => (r._1, r._2)).partition(_._1 <= 3L)
    writeShard("a", a); runStream(s"$base/ckpt")
    writeShard("b", b); runStream(s"$base/ckpt")
    val phrases = Seq(10L -> Seq("alpha", "beta"), 20L -> Seq("go", "go"))
    val streamed = Phrase.phraseMatchAt(spark, idx, phrases).collect().map(_.toString).toSeq
    val cold = Phrase.phraseMatch(spark, dir, phrases).collect().map(_.toString).toSeq
    assert(streamed == cold, s"streamed index diverged:\n$streamed\nvs\n$cold")
    // fresh-checkpoint replay: one big batch 0, already stamped -> no-op
    val n = graft.ops.SnapshotTable.read(spark, s"$idx/positions").count()
    runStream(s"$base/ckpt2")
    assert(graft.ops.SnapshotTable.read(spark, s"$idx/positions").count() == n,
      "replayed stream double-appended positions")
  }

  test("probe reads the positional index, never re-tokenizes text") {
    val dir = mkCorpus()
    val probe = Phrase.phraseMatch(spark, dir, Seq(10L -> Seq("alpha", "beta")))
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    // positions explode is expected; the tokenizer's split must not be
    assert(!plan.contains("split("), s"probe re-tokenized text:\n$plan")
    assert(plan.contains("In(term"), s"expected pushed term restriction:\n$plan")
  }
}
