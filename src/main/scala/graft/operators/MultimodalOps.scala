package graft.operators

import java.security.MessageDigest

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (pipeline north-star): image/audio/video
  * are opaque `binary` columns with typed metadata; decode / feature-
  * extract run as partition-batched functions over the payload bytes.
  *
  * The testdata has no real media, so the payload is the document's UTF-8
  * bytes and [[Decoder]] is the STUB boundary — a deterministic fake
  * standing in for the image/audio codec (absent in this container). The
  * Spark-side plumbing is real: binary column schema, typed Dataset,
  * `mapPartitions` batch shape (one decoder instance per partition, the
  * same contract a Pandas-UDF/`mapInPandas` batch has in PySpark), and a
  * columnar metadata path that never leaves codegen.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  val N_FEATURES = 4

  case class MmDoc(doc_id: Long, payload: Array[Byte])
  case class MmFeat(doc_id: Long, n_bytes: Long, f0: Double, f1: Double, f2: Double, f3: Double)

  /** STUB — the real media decode (JPEG/WAV/MP4 → features) would live
    * here; the container ships no codec libraries, so this is a
    * deterministic fake with the same shape: payload bytes → fixed-width
    * feature vector. Each feature is the md5-derived 32-bit hash of the
    * payload digest + lane index, scaled to [0,1) — reproducible in the
    * DuckDB oracle, exact in doubles (k / 2^32). */
  object Decoder {
    def md5hex(b: Array[Byte]): String =
      MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

    def decode(payload: Array[Byte]): Array[Double] = {
      val digest = md5hex(payload)
      (0 until N_FEATURES).map { i =>
        val h = md5hex(s"$digest:$i".getBytes("UTF-8")).substring(0, 8)
        java.lang.Long.parseLong(h, 16).toDouble / 4294967296.0
      }.toArray
    }
  }

  /** Typed metadata over the opaque payload — pure column algebra (byte
    * length, content digest, modality tag), no decode needed: the cheap
    * catalog pass a 100 TB media corpus runs first. */
  val qMmMeta: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"))
      .orderBy("doc_id")

  /** Decode + feature-extract through the partition-batch path: one
    * [[Decoder]] per partition over the typed Dataset — the Spark-native
    * shape of a Pandas-UDF media pipeline. Output is fixed-width feature
    * lanes (columnar, joinable with the embeddings table downstream). */
  val qMmFeatures: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MmDoc]
      .mapPartitions { docs =>
        docs.map { doc =>
          val f = Decoder.decode(doc.payload)
          MmFeat(doc.doc_id, doc.payload.length.toLong, f(0), f(1), f(2), f(3))
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Fake-video frame geometry: FRAME_BYTES per frame, every
    * FRAME_STRIDE-th frame sampled (the frame-sample step of a video
    * pipeline). */
  val FRAME_BYTES = 256
  val FRAME_STRIDE = 2

  case class MmFrame(doc_id: Long, frame_idx: Long, frame_bytes: Long, frame_digest: String)

  /** Frame sampling — the row-EXPANDING multimodal shape (one input row →
    * many frame rows), complementing [[qMmFeatures]]'s 1:1 decode: the
    * payload is chunked into FRAME_BYTES frames, every FRAME_STRIDE-th
    * frame is kept, and each sampled frame leaves as (index, size,
    * digest). Runs through the same typed mapPartitions batch contract as
    * the decoder (`flatMap` per doc — a real frame extractor plugs in at
    * the slice). The oracle slices VARCHAR (DuckDB 1.0 has no blob
    * substring/md5); byte and char offsets agree because the corpus is
    * pure ASCII — asserted over every SF dir (octet_length == length). */
  val qMmFrames: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MmDoc]
      .mapPartitions { docs =>
        docs.flatMap { doc =>
          val n = doc.payload.length
          val nFrames = (n + FRAME_BYTES - 1) / FRAME_BYTES
          (0 until nFrames by FRAME_STRIDE).iterator.map { i =>
            val from = i * FRAME_BYTES
            val until = math.min(from + FRAME_BYTES, n)
            val frame = java.util.Arrays.copyOfRange(doc.payload, from, until)
            MmFrame(doc.doc_id, i.toLong, (until - from).toLong, Decoder.md5hex(frame))
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize stride: keep every RESIZE_STRIDE-th payload byte. */
  val RESIZE_STRIDE = 4

  case class MmResized(doc_id: Long, n_bytes: Long, resized_bytes: Long, resized_digest: String)

  /** Resize — the size-REDUCING multimodal shape (downsample in place of a
    * real image/audio resampler, which would plug in at the stride loop):
    * keep every RESIZE_STRIDE-th byte of the payload, emit the new size
    * and digest. Same typed mapPartitions contract as the decoder; output
    * is 1:1 so the pass pipelines with the metadata scan. Oracle slices
    * VARCHAR — byte/char parity by the ASCII corpus (see qMmFrames). */
  val qMmResize: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MmDoc]
      .mapPartitions { docs =>
        docs.map { doc =>
          val resized = doc.payload.indices.collect {
            case i if i % RESIZE_STRIDE == 0 => doc.payload(i)
          }.toArray
          MmResized(doc.doc_id, doc.payload.length.toLong,
            resized.length.toLong, Decoder.md5hex(resized))
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_mm_meta"     -> qMmMeta,
    "q_mm_features" -> qMmFeatures,
    "q_mm_frames"   -> qMmFrames,
    "q_mm_resize"   -> qMmResize,
  )

  val oracles: Map[String, String] = Map(
    "q_mm_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_mm_features" -> {
      val lanes = (0 until N_FEATURES).map { i =>
        s"CAST('0x' || substr(md5(md5(text) || ':$i'), 1, 8) AS BIGINT) / 4294967296.0 AS f$i"
      }.mkString(",\n  ")
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  $lanes
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "q_mm_resize" ->
      s"""WITH r AS (
         |  SELECT doc_id, text,
         |    array_to_string(
         |      list_transform(range(1, length(text) + 1, $RESIZE_STRIDE), i -> text[i]),
         |      '') AS resized
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  CAST(length(resized) AS BIGINT) AS resized_bytes,
         |  md5(resized) AS resized_digest
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_mm_frames" ->
      s"""WITH f AS (SELECT doc_id, text, length(text) AS n FROM documents),
         |idx AS (
         |  SELECT doc_id, text, n,
         |    unnest(range(0, (n + ${FRAME_BYTES - 1}) // $FRAME_BYTES, $FRAME_STRIDE)) AS frame_idx
         |  FROM f)
         |SELECT doc_id, frame_idx,
         |  CAST(length(substring(text, frame_idx * $FRAME_BYTES + 1, $FRAME_BYTES)) AS BIGINT) AS frame_bytes,
         |  md5(substring(text, frame_idx * $FRAME_BYTES + 1, $FRAME_BYTES)) AS frame_digest
         |FROM idx ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
