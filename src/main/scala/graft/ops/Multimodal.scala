package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.9 / task extension).
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct
  * alongside — the 100 TB layout: bytes stay columnar in parquet, metadata
  * is prunable without touching payloads, and decode work runs partition-
  * wise so one executor core streams one batch of blobs at a time.
  */
object Multimodal {

  case class Media(id: Long, kind: String, bytes: Array[Byte])

  case class MediaFeatures(id: Long, kind: String, n_bytes: Int,
                           head_byte: Int, checksum: Long,
                           width: Int, height: Int)

  /** STUB DECODE: real image/audio codecs are not installed in this
    * environment. `decode` derives deterministic fake dimensions from the
    * payload bytes; the partition-wise execution shape, typed schema, and
    * binary-column round-trip are the real, tested plumbing — swap the body
    * for an actual codec call in production. */
  def decode(bytes: Array[Byte]): (Int, Int) = {
    val h = bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xff))
    (math.abs(h % 1920).toInt + 1, math.abs((h >> 11) % 1080).toInt + 1)
  }

  /** Partition-wise feature extraction over the opaque binary column. */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h) = decode(m.bytes)
        val checksum = m.bytes.foldLeft(0L)((acc, b) => (acc * 131 + (b & 0xff)) % 2147483647L)
        MediaFeatures(m.id, m.kind, m.bytes.length,
          if (m.bytes.isEmpty) -1 else m.bytes(0) & 0xff, checksum, w, h)
      }
    }
  }

  /** STUB RESIZE: dimension transform over the metadata (a real codec
    * resizes the payload; the stub rescales the fake dims and re-tags the
    * bytes). Partition-wise, same batch shape as a real transcoder. */
  def resize(feats: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.mapPartitions(_.map { f =>
      val scale = math.min(1.0, math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    })
  }

  /** STUB FRAME-SAMPLE: every nth "frame" (64-byte block) of a video
    * payload — the real op decodes frames; the plumbing (one input row →
    * N frame rows, partition-wise, bounded memory) is what matters. */
  def frameSample(media: Dataset[Media], everyNth: Int): Dataset[(Long, Int, Long)] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      m.bytes.grouped(64).zipWithIndex.collect {
        case (frame, idx) if idx % everyNth == 0 =>
          (m.id, idx, frame.foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % 2147483647L))
      }
    })
  }

  /** Build a media table from the documents fixture: utf-8 payload bytes
    * with a deterministic kind tag — stands in for image/audio blobs. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Media] = {
    import spark.implicits._
    docs.select(col("doc_id").as("id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[Media]
  }
}
