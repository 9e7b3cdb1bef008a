package graft.queries

import graft.Q
import org.apache.spark.sql.functions._

/** Multimodal-column operators: treat image/audio/video payloads as
  * opaque `BinaryType` columns with typed metadata, the way a
  * large-scale training-data pipeline stores them in parquet. The test
  * tables carry no real media, so every query derives a deterministic
  * payload from `documents.text` (`encode(text, 'UTF-8')`) — the
  * *plumbing* is the deliverable: binary columns flowing through scans,
  * per-partition batched feature extraction, frame-index fanout, and
  * fixed-size chunking all behave exactly as they would with real JPEG
  * or WAV bytes, because Spark never interprets the payload.
  *
  * The media *decode* step is stubbed (this container has no image or
  * audio codecs): [[FakeDecode.decode]] derives header fields (width,
  * height, channels) from the payload's md5 — a pure deterministic
  * function of the bytes, so the DuckDB oracle can replicate it. A real
  * deployment swaps that one function for an actual codec call; the
  * partitioning, batch shape and schema stay identical.
  *
  * Scale notes: the extract runs as `mapPartitions` over the scanned
  * batch — one task per input split, no shuffle, no driver traffic (the
  * Scala analog of `mapInPandas`). Frame fanout is a generator
  * (`explode(sequence(...))`) so it pipelines inside the scan stage.
  */
object MultimodalOps {

  /** Typed input batch row: the opaque payload + its id. */
  final case class MediaBlob(doc_id: Long, payload: Array[Byte])

  /** Typed decoded-header row produced by the stubbed decoder. */
  final case class MediaMeta(
      doc_id: Long,
      width: Long,
      height: Long,
      channels: Long,
      n_bytes: Long,
      thumb_w: Long,
      thumb_h: Long)

  /** Stubbed media decoder: parses a fake fixed header out of the
    * payload's md5 (deterministic stand-in for reading a JPEG/PNG
    * header). Swap this single function for a real codec in production.
    */
  object FakeDecode {
    def md5Hex(payload: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
      d.map(b => f"$b%02x").mkString
    }

    def decode(b: MediaBlob): MediaMeta = {
      val hex = md5Hex(b.payload)
      val width = 16L + java.lang.Long.parseLong(hex.substring(0, 4), 16) % 2048
      val height = 16L + java.lang.Long.parseLong(hex.substring(4, 8), 16) % 2048
      val channels = 1L + java.lang.Long.parseLong(hex.substring(8, 9), 16) % 4
      val longest = math.max(width, height)
      // Integer thumbnail fit into a 128px box, aspect preserved.
      val (tw, th) =
        if (longest <= 128) (width, height)
        else (math.max(1L, width * 128 / longest), math.max(1L, height * 128 / longest))
      MediaMeta(b.doc_id, width, height, channels, width * height * channels, tw, th)
    }
  }

  /** Binary-column manifest: per-source blob count, total bytes,
    * distinct content digests. The scan reads only (source, text) —
    * with a real media table the payload column statistics come free
    * from the parquet footer and the digest would be precomputed at
    * ingest; here we digest inline to exercise binary expressions. */
  val q60 = Q(
    "q60_binary_manifest",
    "per-source manifest of opaque binary payloads: count/bytes/digests",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("source"),
          encode(col("text"), "UTF-8").as("payload"))
        .select(col("source"), length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("digest"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_blobs"),
          sum(col("n_bytes")).as("total_bytes"),
          countDistinct(col("digest")).as("distinct_digests"))
        .orderBy(col("source")),
    Some("""SELECT source, count(*) AS n_blobs,
        CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        count(DISTINCT md5(text)) AS distinct_digests
      FROM documents GROUP BY source ORDER BY source"""))

  /** Stub-decoded media features via typed per-partition batches.
    *
    * The `mapPartitions` stage is the real multimodal plumbing: each
    * task pulls its partition of (id, payload) rows, runs the decoder
    * batch-wise, and emits a typed metadata row — no shuffle, no
    * collect, executor-local CPU only, exactly how a JPEG/ffprobe
    * extract runs on a 1000-executor cluster. */
  val q61 = Q(
    "q61_media_features",
    "stub-decoded width/height/channels + thumbnail fit, mapPartitions batches",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[MediaBlob]
        .mapPartitions(_.map(FakeDecode.decode))
        .toDF()
        .orderBy(col("doc_id"))
    },
    Some("""WITH hx AS (SELECT doc_id, md5(text) AS hex FROM documents),
      meta AS (
        SELECT doc_id,
          16 + (CAST(('0x' || substring(hex, 1, 4)) AS BIGINT) % 2048) AS width,
          16 + (CAST(('0x' || substring(hex, 5, 4)) AS BIGINT) % 2048) AS height,
          1 + (CAST(('0x' || substring(hex, 9, 1)) AS BIGINT) % 4) AS channels
        FROM hx)
      SELECT doc_id, width, height, channels,
        width * height * channels AS n_bytes,
        CASE WHEN greatest(width, height) <= 128 THEN width
             ELSE greatest(1, (width * 128) // greatest(width, height)) END AS thumb_w,
        CASE WHEN greatest(width, height) <= 128 THEN height
             ELSE greatest(1, (height * 128) // greatest(width, height)) END AS thumb_h
      FROM meta ORDER BY doc_id"""))

  /** Frame sampling over a "video" payload: frame count derived from
    * payload length, every 7th frame sampled, one fingerprint per
    * sampled frame. `explode(sequence(...))` is a generator — the
    * fanout pipelines inside the scan stage with no shuffle; the
    * doc_id filter is pushed to the parquet scan. */
  val q62 = Q(
    "q62_frame_sample",
    "sample every 7th frame of fake videos; per-frame fingerprint",
    (s, dir) =>
      t(s, dir, "documents")
        .where(col("doc_id") % 20 === 0)
        .select(col("doc_id"),
          (lit(1) + (col("n_chars").cast("long") / lit(64)).cast("long")).as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(7L))).as("frame_idx"))
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
          h60(concat(col("doc_id"), lit(":"), col("frame_idx"))).as("fingerprint"))
        .orderBy(col("doc_id"), col("frame_idx")),
    Some(s"""WITH f AS (
        SELECT doc_id, 1 + (n_chars // 64) AS n_frames FROM documents WHERE doc_id % 20 = 0),
      fr AS (
        SELECT doc_id, n_frames, unnest(range(0, n_frames, 7)) AS frame_idx FROM f)
      SELECT doc_id, n_frames, frame_idx,
        ${oH60("doc_id || ':' || frame_idx")} AS fingerprint
      FROM fr ORDER BY doc_id, frame_idx"""))

  /** Fixed-size chunking of binary payloads (how blob stores shard
    * media): 256-byte chunks, per-source chunk/padding accounting.
    * Pure integer arithmetic over `length(payload)` — the payload
    * bytes never leave the scan. */
  val q63 = Q(
    "q63_chunk_manifest",
    "256-byte chunk accounting for binary payloads per source",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("source"),
          length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
        .select(col("source"), col("n_bytes"),
          ((col("n_bytes") + 255) / 256).cast("long").as("n_chunks"))
        .groupBy(col("source"))
        .agg(
          sum(col("n_chunks")).as("total_chunks"),
          sum(col("n_chunks") * 256 - col("n_bytes")).as("total_padding"),
          max(col("n_chunks")).as("max_chunks"))
        .orderBy(col("source")),
    Some("""WITH c AS (
        SELECT source, octet_length(encode(text)) AS n_bytes,
          (octet_length(encode(text)) + 255) // 256 AS n_chunks
        FROM documents)
      SELECT source, CAST(sum(n_chunks) AS BIGINT) AS total_chunks,
        CAST(sum(n_chunks * 256 - n_bytes) AS BIGINT) AS total_padding,
        max(n_chunks) AS max_chunks
      FROM c GROUP BY source ORDER BY source"""))

  def all: Seq[Q] = Seq(q60, q61, q62, q63)
}
