package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star op).
  *
  * Design: media travels as an opaque `binary` column plus typed metadata.
  * Decode / feature-extract runs per-partition over the binary payloads —
  * the Spark-side shape (schema, batching, partition-parallel execution) is
  * real; the codec itself is STUBBED with a deterministic fake because no
  * image/audio libraries exist in this container. Swapping
  * [[MediaDecoder.decodeStub]] for a real JNI/library call changes nothing
  * about the plan.
  *
  * Scale notes: payloads stay columnar-compressed in parquet until the scan
  * projects them; decode is a narrow mapPartitions (no shuffle), so 1000
  * executors decode 1000 slices independently. Metadata-only queries never
  * touch the binary column at all (column pruning).
  */
object Multimodal {

  /** Typed decoded-metadata record (what a real image decode would yield). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long,
      channels: Long, fp: String)

  object MediaDecoder {
    /** Deterministic fake decode: dimensions derived from payload length,
      * fingerprint = md5 of the payload bytes. A real decoder would parse
      * the container header here.
      */
    def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val fp = md.digest(payload).map("%02x".format(_)).mkString
      MediaMeta(
        doc_id = docId,
        n_bytes = payload.length.toLong,
        width = payload.length.toLong % 640 + 1,
        height = payload.length.toLong % 480 + 1,
        channels = 3L,
        fp = fp)
    }
  }

  /** Decode a binary media column to typed metadata, partition-parallel.
    * `documents.text` stands in for the payload (cast to its UTF-8 bytes);
    * with a real media table this would be the stored blob column.
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => MediaDecoder.decodeStub(id, bytes) })
      .toDF()
  }

  /** Frame sampling over a binary "video" payload: every `stride` bytes,
    * take a `frameBytes`-byte frame; emit per-frame metadata + content
    * hash. Runs as a partition-parallel flatMap over the payload bytes —
    * the exact shape of a real frame extractor (decode stub, Spark
    * plumbing real). Scale: narrow transform, no shuffle; frame rows
    * scale linearly and spill to the sink incrementally.
    */
  def frameSample(spark: SparkSession, docs: DataFrame,
      frameBytes: Int = 64, stride: Int = 128): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        Iterator.range(0, bytes.length, stride).zipWithIndex.map {
          case (off, idx) =>
            val frame = java.util.Arrays.copyOfRange(
              bytes, off, math.min(off + frameBytes, bytes.length))
            md.reset()
            val fp = md.digest(frame).map("%02x".format(_)).mkString
            (id, idx.toLong, frame.length.toLong, fp)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_md5")
  }

  /** Feature extraction over a binary payload: a dense 16-bin byte
    * histogram per document (the shape of any per-media feature vector —
    * color histogram, MFCC bucket counts — with the codec stubbed to raw
    * bytes). Tight per-partition loop, no shuffle; the feature column is
    * a fixed-width array ready for the similarity operators.
    */
  def byteHistogram(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val hist = new Array[Long](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
        (id, hist)
      })
      .toDF("doc_id", "hist")
  }

  /** Resize / downsample stub: keep every `stride`-th byte of the payload
    * (a real resizer interpolates pixels; the stubbed kernel is
    * nearest-neighbor over raw bytes, which keeps the output exactly
    * computable by the oracle). Narrow map, no shuffle; output payload is
    * 1/stride the size — the storage win a real thumbnail pass buys.
    */
  def resizePayload(spark: SparkSession, docs: DataFrame,
      stride: Int = 4): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val n = (bytes.length + stride - 1) / stride
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) { out(i) = bytes(i * stride); i += 1 }
        val md = java.security.MessageDigest.getInstance("MD5")
        val fp = md.digest(out).map("%02x".format(_)).mkString
        (id, out.length.toLong, fp)
      })
      .toDF("doc_id", "resized_bytes", "resized_md5")
  }

  // ---- declared queries -------------------------------------------------

  /** Difference-hash (dHash) bands over a binary payload — the standard
    * perceptual near-dup fingerprint for images (Krawetz's dHash: resize
    * to a 9×8 grid, hash = sign of horizontal gradients), rendered on
    * the stub decode: grid cell (r,c) = sum of payload bytes at offsets
    * ≡ r·9+c (mod 72) — a real decoder would average pixel blocks here;
    * the gradient/banding machinery downstream is unchanged. 64 bits
    * split into 8 row-bands of 8 bits for pigeonhole-complete banding
    * (hamming ≤ 7 ⇒ at least one identical band — x04's idiom on a
    * perceptual hash).
    *
    * Narrow partition-parallel pass, integer-only; one row per (doc,
    * band). ASCII payloads make DuckDB's codepoint view byte-identical
    * (the x50 argument), so the oracle replays the exact grid.
    */
  def dhashBands(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val cell = new Array[Long](72)
        var i = 0
        while (i < bytes.length) { cell(i % 72) += bytes(i) & 0xffL; i += 1 }
        Iterator.range(0, 8).map { r =>
          var v = 0L
          var c = 0
          while (c < 8) {
            if (cell(r * 9 + c) < cell(r * 9 + c + 1)) v |= 1L << c
            c += 1
          }
          (id, r.toLong, v)
        }
      }
      .toDF("doc_id", "band", "v")
  }

  /** x202: perceptual near-dup pairs — banded candidate join on the dHash
    * bands, exact hamming verify, threshold 7 (= the pigeonhole bound, so
    * the banded candidate set is provably complete: no pair within the
    * threshold can differ in all 8 bands). The multimodal twin of x03's
    * LSH dedup: same route-by-equality shape, but the key is a perceptual
    * gradient signature of the PAYLOAD, not a token shingle — byte-level
    * revisions that preserve overall structure land within a few bits
    * (the fixture yields hamming 0, 1 and 2 pairs at every SF).
    *
    * Scale: band join is an equi-join on (band, value) — at real corpus
    * sizes the band-value buckets are the partition key and the verify
    * join fans out only candidate pairs; the hamming verify reads the
    * 8-row band table, never payloads.
    */
  def phashNearDup(spark: SparkSession, docs: DataFrame): DataFrame = {
    val bands = dhashBands(spark, docs)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    cand
      .join(bands.select(col("doc_id").as("a"), col("band"), col("v").as("va")),
        Seq("a"))
      .join(bands.select(col("doc_id").as("b2"), col("band").as("bb"),
        col("v").as("vb")), col("b") === col("b2") && col("band") === col("bb"))
      .groupBy("a", "b")
      .agg(sum(bit_count(expr("va ^ vb")).cast("long")).as("hamming"))
      .filter(col("hamming") <= 7)
      .orderBy("a", "b")
  }

  private val phashNearDupSql: String =
    """WITH chars AS (
      |  SELECT doc_id,
      |         generate_subscripts(string_split(text, ''), 1) AS i,
      |         unnest(string_split(text, '')) AS ch
      |  FROM documents),
      | sparse AS (
      |  SELECT doc_id, (i-1) % 72 AS k, sum(ascii(ch)) AS cell
      |  FROM chars GROUP BY 1, 2),
      | -- densify: a doc shorter than 72 bytes never touches its tail
      | -- cells; they must exist AS ZEROS (the Spark array is zero-
      | -- filled) or the inner joins below silently drop whole bands
      | -- from short docs' hashes and the hamming sum under-counts
      | cells AS (
      |  SELECT d.doc_id, g.k, coalesce(s.cell, 0) AS cell
      |  FROM (SELECT DISTINCT doc_id FROM documents) d
      |  CROSS JOIN generate_series(0, 71) g(k)
      |  LEFT JOIN sparse s ON s.doc_id = d.doc_id AND s.k = g.k),
      | bits AS (
      |  SELECT a.doc_id, j // 8 AS band,
      |         CASE WHEN a.cell < b.cell THEN 1 ELSE 0 END << (j % 8) AS bv
      |  FROM generate_series(0, 63) g(j)
      |  JOIN cells a ON a.k = (j // 8) * 9 + (j % 8)
      |  JOIN cells b ON b.k = (j // 8) * 9 + (j % 8) + 1
      |               AND b.doc_id = a.doc_id),
      | bands AS (SELECT doc_id, band, CAST(sum(bv) AS BIGINT) AS v
      |           FROM bits GROUP BY 1, 2),
      | cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |          FROM bands x JOIN bands y
      |            ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id),
      | ham AS (SELECT c.a, c.b,
      |                CAST(sum(bit_count(xor(ba.v, bb.v))) AS BIGINT)
      |                  AS hamming
      |         FROM cand c
      |         JOIN bands ba ON ba.doc_id = c.a
      |         JOIN bands bb ON bb.doc_id = c.b AND bb.band = ba.band
      |         GROUP BY 1, 2)
      |SELECT a, b, hamming FROM ham WHERE hamming <= 7
      |ORDER BY a, b""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef(
      "x202_phash_neardup",
      (s, dir) => phashNearDup(s, Tables.documents(s, dir)),
      Some(phashNearDupSql)),

    // The stub is deterministic arithmetic over byte lengths + md5, so even
    // the "decode" is oracle-checkable — the plumbing is verified end-to-end.
    QueryDef(
      "x11_multimodal_meta",
      (s, dir) => decodeMeta(s, Tables.documents(s, dir)).orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |       CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
             |       CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS height,
             |       CAST(3 AS BIGINT) AS channels,
             |       md5(text) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Frame sampling oracle: documents.text is pure ASCII (verified), so
    // VARCHAR substr in DuckDB slices the same bytes the Spark side slices
    // from the binary payload.
    QueryDef(
      "x22_frame_sample",
      (s, dir) => frameSample(s, Tables.documents(s, dir))
        .orderBy("doc_id", "frame_idx"),
      Some("""SELECT doc_id, frame_idx,
             |       CAST(length(f) AS BIGINT) AS frame_bytes, md5(f) AS frame_md5
             |FROM (
             |  SELECT doc_id, frame_idx, substr(text, CAST(frame_idx * 128 + 1 AS BIGINT), 64) AS f
             |  FROM (SELECT doc_id, text,
             |               unnest(generate_series(0, CAST((length(text) - 1) // 128 AS BIGINT))) AS frame_idx
             |        FROM documents) g) t
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // Byte-histogram features: text is pure ASCII (see x22), so ord() per
    // char in DuckDB sees the same bytes the Spark loop buckets; dense
    // bins come from a generate_series cross join (bins 8-15 are zero for
    // ASCII but the vector width is fixed).
    // The declared query stringifies the histogram (array_join /
    // array_to_string) because the driver's pandas harness cannot sort
    // ARRAY-typed result columns; byteHistogram itself still returns the
    // dense array<long> feature vector for downstream similarity use.
    QueryDef(
      "x50_byte_histogram",
      (s, dir) => byteHistogram(s, Tables.documents(s, dir))
        .select(col("doc_id"),
          expr("array_join(transform(hist, x -> CAST(x AS STRING)), ',')")
            .as("hist"))
        .orderBy("doc_id"),
      Some("""SELECT d.doc_id,
             |       array_to_string(list(COALESCE(b.cnt, 0) ORDER BY gs.bin), ',') AS hist
             |FROM documents d
             |CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bin) gs
             |LEFT JOIN (
             |  SELECT doc_id, ord(c) // 16 AS bin, count(*) AS cnt
             |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
             |        FROM documents) ch
             |  GROUP BY 1, 2) b
             |  ON b.doc_id = d.doc_id AND b.bin = gs.bin
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "x51_resize",
      (s, dir) => resizePayload(s, Tables.documents(s, dir)).orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(length(r) AS BIGINT) AS resized_bytes,
             |       md5(r) AS resized_md5
             |FROM (
             |  SELECT doc_id, string_agg(substr(text, j, 1), '' ORDER BY j) AS r
             |  FROM (SELECT doc_id, text,
             |               unnest(generate_series(1, length(text), 4)) AS j
             |        FROM documents) g
             |  GROUP BY 1) t
             |ORDER BY doc_id""".stripMargin))
  )
}
