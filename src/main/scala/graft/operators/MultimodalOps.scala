package graft.operators

import graft.corpus.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque BINARY columns
  * with typed metadata, processed batch-wise in a typed mapPartitions
  * (the Scala analogue of a pandas-batch UDF seam). The actual media
  * decode is a clearly-marked deterministic STUB — image/audio codecs
  * are not in this container — but the Spark-side contract (schema,
  * batching, partitioning, per-row metadata derivation) is real and
  * oracle-checked for the arithmetic part.
  */
object MultimodalOps {

  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, fmt: String, feat: Seq[Double])

  /** STUB decode: a real implementation would parse the container
    * format here (JPEG markers / WAV header / MP4 atoms). The stub
    * derives deterministic "dimensions" and a tiny feature vector from
    * the byte content so the pipeline shape is testable end-to-end.
    */
  private[operators] def decodeStub(docId: Long, media: Array[Byte]): MediaMeta = {
    val n = media.length.toLong
    var checksum = 0L
    var i = 0
    while (i < media.length) { checksum += (media(i) & 0xff); i += 1 }
    val feat = (0 until 4).map(j =>
      graft.functions.BM25.roundScore(((checksum + j * 7919) % 1000L) / 1000.0))
    MediaMeta(docId, n, n % 640L, (n * 7L) % 480L, "stub", feat)
  }

  /** Pipeline: documents → (doc_id, media BINARY) → batched typed
    * decode → metadata table. Partitioning note: media rows are large;
    * at scale you repartition by size budget before the decode stage
    * (maxPartitionBytes on the scan side covers the parquet path).
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Corpus.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[(Long, Array[Byte])]
    media.mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
      .select(col("doc_id").cast("long"), col("n_bytes").cast("long"),
        col("width").cast("long"), col("height").cast("long"), col("fmt"))
      .orderBy("doc_id")
  }

  /** The arithmetic part of the stub is oracle-checkable from the text
    * length (corpus text is ASCII → octet_length == length).
    */
  val mediaMetaOracleSql: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
      |       CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
      |       'stub' AS fmt
      |FROM documents ORDER BY doc_id""".stripMargin
}
