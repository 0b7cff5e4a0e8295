package graft.operators

import graft.corpus.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque BINARY columns
  * with typed metadata, processed batch-wise in a typed mapPartitions
  * (the Scala analogue of a pandas-batch UDF seam).
  *
  * The container has no image/audio codecs, so the FIXTURE synthesizes
  * real container headers arithmetically (BMP `BITMAPINFOHEADER` for
  * even doc ids, RIFF/WAVE `fmt ` for odd ones, payload = the doc's
  * UTF-8 bytes) — and the decode stage is a REAL header parser: it
  * checks magics and reads the little-endian width/height/sample-rate/
  * channel fields from the byte stream, exactly what a production
  * decode stage does before handing pixels/samples to a codec. The
  * DuckDB oracle predicts the same fields independently from the
  * generator's arithmetic, so a parser that misreads any offset fails
  * the hash gate.
  */
object MultimodalOps {

  final case class MediaMeta(doc_id: Long, fmt: String, n_bytes: Long,
      width: Long, height: Long, sample_rate: Long, channels: Long)

  private def le32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def le16(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def readLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def readLe16(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8)

  /** Synthesize a BMP (54-byte header + payload) with dimensions derived
    * from the payload length — a REAL header any BMP parser reads.
    */
  private[operators] def bmpPayload(content: Array[Byte]): Array[Byte] = {
    val n = content.length
    val b = new Array[Byte](54 + n)
    b(0) = 'B'; b(1) = 'M'
    le32(b, 2, 54L + n)          // file size
    le32(b, 10, 54L)             // pixel-array offset
    le32(b, 14, 40L)             // BITMAPINFOHEADER size
    le32(b, 18, (n % 640L) + 1)  // width
    le32(b, 22, ((n * 7L) % 480L) + 1) // height
    le16(b, 26, 1L)              // planes
    le16(b, 28, 24L)             // bits per pixel
    le32(b, 34, n.toLong)        // image size
    System.arraycopy(content, 0, b, 54, n)
    b
  }

  /** Synthesize a RIFF/WAVE (44-byte canonical header + payload). */
  private[operators] def wavPayload(content: Array[Byte]): Array[Byte] = {
    val n = content.length
    val b = new Array[Byte](44 + n)
    val sr = 8000L + (n % 8L) * 1000L
    val ch = (n % 2L) + 1
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    le32(b, 4, 36L + n)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    le32(b, 16, 16L)             // fmt chunk size
    le16(b, 20, 1L)              // PCM
    le16(b, 22, ch)              // channels
    le32(b, 24, sr)              // sample rate
    le32(b, 28, sr * ch * 2)     // byte rate
    le16(b, 32, ch * 2)          // block align
    le16(b, 34, 16L)             // bits per sample
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    le32(b, 40, n.toLong)
    System.arraycopy(content, 0, b, 44, n)
    b
  }

  /** REAL container-header decode: identify the format by magic bytes
    * and parse the little-endian metadata fields. Unknown/truncated
    * payloads come back as fmt "unknown" instead of crashing the
    * pipeline (the production posture for a web-scale media crawl).
    */
  private[operators] def decodeMedia(docId: Long, media: Array[Byte]): MediaMeta = {
    val n = media.length.toLong
    if (media.length >= 54 && media(0) == 'B' && media(1) == 'M')
      MediaMeta(docId, "bmp", n,
        width = readLe32(media, 18), height = readLe32(media, 22),
        sample_rate = 0L, channels = 0L)
    else if (media.length >= 44 &&
        media(0) == 'R' && media(1) == 'I' && media(2) == 'F' && media(3) == 'F' &&
        media(8) == 'W' && media(9) == 'A' && media(10) == 'V' && media(11) == 'E')
      MediaMeta(docId, "wav", n,
        width = 0L, height = 0L,
        sample_rate = readLe32(media, 24), channels = readLe16(media, 22))
    else MediaMeta(docId, "unknown", n, 0L, 0L, 0L, 0L)
  }

  /** Pipeline: documents → (doc_id, media BINARY) → batched typed
    * decode → metadata table. Partitioning note: media rows are large;
    * at scale you repartition by size budget before the decode stage
    * (maxPartitionBytes on the scan side covers the parquet path).
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Corpus.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      .as[(Long, Array[Byte])]
      // fixture synth: even ids carry a BMP, odd ids a WAV, payload =
      // the doc bytes — the opaque BINARY column a crawl table stores
      .map { case (id, bytes) =>
        (id, if (id % 2 == 0) bmpPayload(bytes) else wavPayload(bytes))
      }
    media.mapPartitions(_.map { case (id, bytes) => decodeMedia(id, bytes) })
      .toDF()
      .select(col("doc_id").cast("long"), col("fmt"), col("n_bytes").cast("long"),
        col("width").cast("long"), col("height").cast("long"),
        col("sample_rate").cast("long"), col("channels").cast("long"))
      .orderBy("doc_id")
  }

  /** The oracle predicts every parsed field independently from the
    * generator's arithmetic over the doc's byte length (corpus text is
    * ASCII → octet_length == length), so a parser misreading any header
    * offset hash-fails.
    */
  val mediaMetaOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
      |)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS fmt,
      |       CAST(CASE WHEN doc_id % 2 = 0 THEN 54 + n ELSE 44 + n END AS BIGINT) AS n_bytes,
      |       CAST(CASE WHEN doc_id % 2 = 0 THEN (n % 640) + 1 ELSE 0 END AS BIGINT) AS width,
      |       CAST(CASE WHEN doc_id % 2 = 0 THEN ((n * 7) % 480) + 1 ELSE 0 END AS BIGINT) AS height,
      |       CAST(CASE WHEN doc_id % 2 = 1 THEN 8000 + (n % 8) * 1000 ELSE 0 END AS BIGINT) AS sample_rate,
      |       CAST(CASE WHEN doc_id % 2 = 1 THEN (n % 2) + 1 ELSE 0 END AS BIGINT) AS channels
      |FROM d ORDER BY doc_id""".stripMargin
}
