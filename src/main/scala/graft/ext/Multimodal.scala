package graft.ext

import graft.Tables
import graft.ops.Q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing (SURVEY.md §2.11): media payloads travel as
  * opaque `binary` columns with typed metadata structs; decode / feature
  * extraction runs as a partition-local typed transformation.
  *
  * The container has no image/audio codecs, so `decodeStub` is a clearly
  * marked deterministic FAKE decoder — the Spark-side contract (schema,
  * binary transport, partition-local batch processing, metadata struct
  * shape) is real and tested. Swap `decodeStub` for a JNI/FFI codec on a
  * real cluster; nothing else changes.
  */
object Multimodal {

  /** Typed media record: payload + envelope metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded-media features (what a real decoder would emit per frame/clip). */
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
                           width: Int, height: Int, n_frames: Int,
                           mean_intensity: Double)

  /** Build a media table from the documents fixture: text bytes stand in for
    * an opaque payload (parquet `binary`), `kind` cycles image/audio/video. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        element_at(typedlit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))

  /** STUB decoder — deterministic fake standing in for an image/audio codec
    * (none available offline). Derives plausible features purely from the
    * payload bytes so tests are reproducible. Real implementation: ??? */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val len = r.payload.length.toLong
    // fake "decode": dimensions & intensity derived from byte content
    val sum = { var s = 0L; var i = 0; while (i < r.payload.length) { s += (r.payload(i) & 0xff); i += 1 }; s }
    MediaFeatures(r.media_id, r.kind, len,
      width = (len % 640).toInt + 1, height = (len % 480).toInt + 1,
      n_frames = if (r.kind == "video") (len % 24).toInt + 1 else 1,
      mean_intensity = if (len == 0) 0.0 else sum.toDouble / len)
  }

  /** Partition-local decode: one task per input split, no shuffle, payloads
    * never leave the executor. The 100 TB shape — decode cost scales with
    * cores; metadata-only columns flow onward. */
  def decodeAll(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRecord]
      .mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling: one row per sampled frame of each decoded video —
    * explode-based fan-out (media_id, frame_idx, frame_sha). The per-frame
    * "content" is a deterministic stub slice of the payload; the Spark shape
    * (decode → explode → per-frame rows for a downstream embedder) is the
    * real 100 TB pattern. */
  def sampleFrames(s: SparkSession, dir: String, stride: Int = 5): DataFrame = {
    import s.implicits._
    decodeAll(s, dir)
      .filter(_.kind == "video")
      .toDF()
      .join(mediaTable(s, dir), Seq("media_id", "kind"))
      .select(col("media_id"), col("n_frames"), col("payload"),
        explode(sequence(lit(0), expr(s"(n_frames - 1) div $stride"))).as("sample_i"))
      .select(col("media_id"),
        (col("sample_i") * stride).as("frame_idx"),
        sha2(concat(col("payload"),
          (col("sample_i") * stride).cast("string").cast("binary")), 256)
          .as("frame_sha"))
  }

  /** Resized-media record: original + target dims and the transformed
    * payload's digest (the payload itself would flow on in production). */
  case class ResizedMedia(media_id: Long, width: Int, height: Int,
                          new_width: Int, new_height: Int, resized_sha: String)

  /** STUB resize — the binary→binary image-preprocessing shape: payloads
    * are transformed WHERE THEY SIT (partition-local typed map, no shuffle;
    * a real JNI codec slots into this exact signature). Deterministic:
    * target dims fit the stub-decoded frame into a 224-box with integer
    * arithmetic, and the "resized payload" stands in as
    * sha256(payload ++ ":WxH" tag) — so the whole path is oracle-checkable. */
  def resizeAll(s: SparkSession, dir: String): Dataset[ResizedMedia] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRecord]
      .mapPartitions(_.filter(_.kind == "image").map { r =>
        val f = decodeStub(r)
        val (nw, nh) =
          if (f.width >= f.height) (224, math.max(1, f.height * 224 / f.width))
          else (math.max(1, f.width * 224 / f.height), 224)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        md.update(r.payload)
        md.update(s":${nw}x$nh".getBytes("UTF-8"))
        ResizedMedia(r.media_id, f.width, f.height, nw, nh,
          md.digest().map("%02x".format(_)).mkString)
      })
  }

  /** 60-bit dHash over a string payload: bit j ⟺ char at stride position j
    * is binary-collation-greater than the char at position j+1, positions
    * spread evenly over the content (1 + j·(len−1) div 60). A pure
    * scan-stage expression — one constant-width signature per row. */
  def phash60(payload: String): org.apache.spark.sql.Column = {
    def at(j: Int) = expr(
      s"substring($payload, CAST(1 + ($j * (length($payload) - 1)) div 60 AS INT), 1)")
    (0 until 60).map { j =>
      when(at(j) > at(j + 1), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** EXACT Hamming-≤3 pairs from (id, phash) rows via 4×15-bit LSH bands:
    * pigeonhole guarantees every pair within 3 flipped bits shares an
    * untouched band, so banding is a pure optimization over the quadratic
    * all-pairs scan — band-keyed shuffle, candidate-only bit_count verify,
    * the MinHash-dedup shape at image scale.
    *
    * Degenerate corpora (a crawl with one image mirrored N times) make the
    * hamming-0 pair set legitimately quadratic — N identical signatures in
    * one bucket. Route through exact content-hash dedup FIRST (the
    * [[Dedup.dedupCorpus]] pattern: byte-identical payloads collapse to one
    * representative before any banding), so the pair join only ever sees
    * distinct payloads. */
  def phashNearDupPairs(hashed: DataFrame, threshold: Int = 3): DataFrame = {
    require(threshold <= 3, "4 bands of 15 bits are only exact up to hamming 3")
    val banded = hashed.select(col("media_id"), col("phash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("phash"), 15 * b).bitwiseAND(lit(32767L))
            .as("bv"))): _*)).as("bb"))
      .select(col("media_id"), col("phash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        expr("bit_count(a.phash ^ b.phash)").as("hamming"))
      .filter(col("hamming") <= threshold)
      .distinct()
  }

  val qs: Seq[Q] = Seq(

    // Metadata extraction over the binary payload — oracle-paired: byte
    // length + content hash are engine-portable.
    Q("x_mm_binary_meta",
      (s, dir) => mediaTable(s, dir)
        .select(col("media_id"), col("kind"),
          octet_length(col("payload")).cast("long").as("byte_len"),
          sha2(col("payload"), 256).as("content_sha"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
                CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                     WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
                sha256(text) AS content_sha
              FROM documents ORDER BY media_id ASC NULLS FIRST""")),

    // Stubbed decode + per-kind feature aggregation — oracle-paired: the
    // stub decoder is deterministic ARITHMETIC over the payload bytes
    // (byte_len, n_frames = len % 24 + 1 for video), so the DuckDB twin
    // re-derives the same features and the whole typed mapPartitions path
    // is hash-checked end to end.
    Q("x_mm_decode_features",
      (s, dir) => decodeAll(s, dir).toDF()
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum("byte_len").as("total_bytes"),
          max("n_frames").as("max_frames"))
        .orderBy("kind"),
      Some("""WITH m AS (SELECT doc_id,
                     CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                          WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                     CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len
                   FROM documents)
              SELECT kind, count(*) AS n,
                     CAST(sum(byte_len) AS BIGINT) AS total_bytes,
                     max(CASE WHEN kind = 'video'
                         THEN CAST(byte_len % 24 + 1 AS INTEGER) ELSE 1 END) AS max_frames
              FROM m GROUP BY kind ORDER BY kind ASC NULLS FIRST""")),

    // Frame sampling fan-out (decode → explode → per-frame rows). The stub
    // decoder is deterministic (n_frames = byte_len % 24 + 1 for videos), so
    // the whole typed-Dataset path IS oracle-expressible — the DuckDB twin
    // re-derives the fan-out and per-frame hashes from first principles.
    Q("x_mm_frame_sample",
      (s, dir) => sampleFrames(s, dir, stride = 5)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("frame_sha"))
        .orderBy("media_id", "frame_idx"),
      Some("""WITH v AS (SELECT doc_id AS media_id, text,
                     CAST(octet_length(CAST(text AS BLOB)) % 24 + 1 AS INTEGER) AS n_frames
                   FROM documents WHERE doc_id % 3 = 2)
              SELECT media_id, CAST(i * 5 AS BIGINT) AS frame_idx,
                     sha256(text || CAST(i * 5 AS VARCHAR)) AS frame_sha
              FROM v, LATERAL (SELECT unnest(generate_series(0, (n_frames - 1) // 5)) AS i) u
              ORDER BY media_id ASC NULLS FIRST, frame_idx ASC NULLS FIRST""")),

    // Resize (aspect-preserving fit into a 224 box) through the typed
    // partition-local path — like the decode, the deterministic stub makes
    // the binary→binary transform oracle-expressible: the DuckDB twin
    // re-derives dims from first principles and hashes the same
    // payload+tag bytes.
    Q("x_mm_resize",
      (s, dir) => resizeAll(s, dir).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("new_width"), col("new_height"), col("resized_sha"))
        .orderBy("media_id"),
      Some("""WITH m AS (SELECT doc_id AS media_id, text,
                     CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS len
                   FROM documents WHERE doc_id % 3 = 0),
              d AS (SELECT media_id, text,
                     CAST(len % 640 + 1 AS INTEGER) AS width,
                     CAST(len % 480 + 1 AS INTEGER) AS height
                   FROM m),
              r AS (SELECT media_id, text, width, height,
                     CASE WHEN width >= height THEN 224
                          ELSE greatest(1, (width * 224) // height) END AS nw,
                     CASE WHEN width >= height THEN greatest(1, (height * 224) // width)
                          ELSE 224 END AS nh
                   FROM d)
              SELECT media_id, width, height,
                     CAST(nw AS INTEGER) AS new_width,
                     CAST(nh AS INTEGER) AS new_height,
                     sha256(text || ':' || CAST(nw AS VARCHAR) || 'x' || CAST(nh AS VARCHAR)) AS resized_sha
              FROM r ORDER BY media_id ASC NULLS FIRST""")),

    // Perceptual hashing over the image corpus: a 60-bit dHash — bit j set
    // iff "pixel" j compares above pixel j+1 along a fixed 61-point stride
    // across the decoded content (here the stub pixels are the payload's
    // characters, compared under binary collation, which both engines
    // define identically; 60 bits, not 64, because DuckDB's checked BIGINT
    // shift overflows at 1<<63 — same width convention as the md5-60
    // primitive). The query emits each image's signature plus its 4×15-bit
    // Hamming-band keys — the join keys [[phashNearDupPairs]] buckets on.
    // The banded pair join itself is EXACT at threshold ≤3 (pigeonhole: 3
    // flipped bits cannot touch all 4 bands) and is pinned by
    // MultimodalSpec against brute force; on this text-backed fixture the
    // planted near-duplicates are token-level rewrites (min pairwise
    // hamming 12), so the pair set at ≤3 is legitimately empty and the
    // signature+bands surface is the oracle-gated query.
    Q("x_mm_phash",
      (s, dir) => {
        val images = Tables(s, dir, "documents")
          .filter(col("doc_id") % 3 === 0)
          .select(col("doc_id").as("media_id"), col("text"))
        images.select(col("media_id"), phash60("text").as("phash"))
          .select(col("media_id"), col("phash"),
            shiftrightunsigned(col("phash"), 0).bitwiseAND(lit(32767L)).as("b0"),
            shiftrightunsigned(col("phash"), 15).bitwiseAND(lit(32767L)).as("b1"),
            shiftrightunsigned(col("phash"), 30).bitwiseAND(lit(32767L)).as("b2"),
            shiftrightunsigned(col("phash"), 45).bitwiseAND(lit(32767L)).as("b3"))
          .orderBy("media_id")
      },
      Some("""WITH img AS (SELECT doc_id AS media_id, text FROM documents
                   WHERE doc_id % 3 = 0),
              ph AS (SELECT media_id,
                       CAST(list_sum(list_transform(range(0, 60), j ->
                         CASE WHEN substring(text, CAST(1 + (j * (length(text) - 1)) // 60 AS INT), 1)
                                 > substring(text, CAST(1 + ((j + 1) * (length(text) - 1)) // 60 AS INT), 1)
                              THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS phash
                     FROM img)
              SELECT media_id, phash,
                     (phash >> 0) & 32767 AS b0,
                     (phash >> 15) & 32767 AS b1,
                     (phash >> 30) & 32767 AS b2,
                     (phash >> 45) & 32767 AS b3
              FROM ph ORDER BY media_id ASC NULLS FIRST""")),

    // The documented routing contract on [[phashNearDupPairs]], composed
    // end-to-end: byte-identical payloads collapse FIRST through exact
    // content-hash dedup (constant-width sha key — the degenerate
    // mirrored-image corpus never reaches the band join), then the banded
    // Hamming-≤3 pair join runs over REPRESENTATIVES only. Output is the
    // per-representative routing summary (copies collapsed, near-pairs
    // found), so both routes are visible to the hash gate. Every shuffle is
    // constant-width (sha-256 key, 15-bit band keys) — no payload bytes and
    // no quadratic blowup at any corpus shape.
    Q("x_mm_phash_routed",
      (s, dir) => {
        val images = Tables(s, dir, "documents")
          .filter(col("doc_id") % 3 === 0)
          .select(col("doc_id").as("media_id"), col("text"))
        val groups = images
          .groupBy(sha2(col("text"), 256).as("content_sha"))
          .agg(min("media_id").as("rep_id"), count(lit(1)).as("n_copies"))
        val reps = images
          .join(groups.select(col("rep_id").as("media_id")), "media_id")
        val pairs = phashNearDupPairs(
          reps.select(col("media_id"), phash60("text").as("phash")))
        val pairCounts = pairs
          .select(explode(array(col("id_a"), col("id_b"))).as("rep_id"))
          .groupBy("rep_id").agg(count(lit(1)).as("n_near"))
        groups.join(pairCounts, Seq("rep_id"), "left")
          .select(col("rep_id"), col("n_copies"),
            coalesce(col("n_near"), lit(0L)).as("n_near_pairs"))
          .orderBy("rep_id")
      },
      Some("""WITH img AS (SELECT doc_id AS media_id, text FROM documents
                   WHERE doc_id % 3 = 0),
              g AS (SELECT sha256(text) AS content_sha, min(media_id) AS rep_id,
                      count(*) AS n_copies
                    FROM img GROUP BY sha256(text)),
              reps AS (SELECT i.media_id, i.text
                       FROM img i JOIN g ON i.media_id = g.rep_id),
              ph AS (SELECT media_id,
                       CAST(list_sum(list_transform(range(0, 60), j ->
                         CASE WHEN substring(text, CAST(1 + (j * (length(text) - 1)) // 60 AS INT), 1)
                                 > substring(text, CAST(1 + ((j + 1) * (length(text) - 1)) // 60 AS INT), 1)
                              THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS phash
                     FROM reps),
              banded AS (SELECT media_id, phash, bd,
                           (phash >> (15 * bd)) & 32767 AS bv
                         FROM ph, LATERAL (SELECT unnest([0, 1, 2, 3]) AS bd) u),
              pairs AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
                        FROM banded a JOIN banded b
                          ON a.bd = b.bd AND a.bv = b.bv AND a.media_id < b.media_id
                        WHERE bit_count(xor(a.phash, b.phash)) <= 3),
              pc AS (SELECT rep_id, count(*) AS n_near FROM (
                       SELECT id_a AS rep_id FROM pairs
                       UNION ALL SELECT id_b AS rep_id FROM pairs) e
                     GROUP BY rep_id)
              SELECT g.rep_id, g.n_copies,
                     coalesce(pc.n_near, CAST(0 AS BIGINT)) AS n_near_pairs
              FROM g LEFT JOIN pc ON g.rep_id = pc.rep_id
              ORDER BY g.rep_id ASC NULLS FIRST"""))
  )
}
