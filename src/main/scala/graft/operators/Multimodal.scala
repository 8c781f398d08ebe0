package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing (north-star set): media as opaque `binary`
  * columns with typed metadata, decoded / feature-extracted by a
  * per-partition batch operator.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub ([[StubDecoder]]) behind the same seam
  * a real decoder would use; the Spark-side plumbing — binary schema,
  * partition-batched execution, typed output, pushdown-friendly metadata —
  * is real and tested (`MultimodalSpec`).
  *
  * Scale notes: decode runs via `mapPartitions` over a `Dataset[MediaRow]`
  * (the Scala analogue of `mapInPandas` batch UDFs): one decoder init per
  * partition, not per row; binary payloads never shuffle (decode before any
  * wide op); metadata-only queries (q_multimodal_meta) never touch the
  * decoder at all and stay in pure codegen.
  */
object Multimodal {

  /** A media payload row: opaque bytes + envelope metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (what a real image/audio decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: String
  )

  /** Decoder seam. A production deployment binds a codec (JPEG, PCM, ...);
    * here a deterministic fake derives plausible dimensions from content
    * bytes so tests can assert exact values.
    */
  trait Decoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** STUB: stands in for the real media decode (no codecs in this
    * environment). Deterministic in payload content.
    */
  object StubDecoder extends Decoder {
    def decode(row: MediaRow): MediaFeatures = {
      val bytes = row.payload
      val sum   = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      MediaFeatures(
        doc_id = row.doc_id,
        media_type = row.media_type,
        n_bytes = bytes.length.toLong,
        width = 16 + (sum % 240).toInt,
        height = 16 + ((sum / 7) % 240).toInt,
        n_frames = 1 + (bytes.length % 30),
        checksum = java.security.MessageDigest
          .getInstance("MD5")
          .digest(bytes)
          .map("%02x".format(_))
          .mkString
      )
    }
  }

  /** Fake a media table from documents: text bytes stand in for image
    * payloads (binary column + envelope metadata).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        concat(lit("image/fake-"), col("source")).as("media_type"),
        col("text").cast("binary").as("payload")
      )

  /** The batch decode operator: one decoder per partition, typed output. */
  def extractFeatures(media: DataFrame, decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows => rows.map(decoder.decode) }
  }

  /** One sampled frame: parent doc, frame index, frame payload + dims. */
  final case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int, frame: Array[Byte])

  /** Frame sampling: every `everyN`-th frame of each media payload, as a
    * typed flatMap (1 row in, k rows out — the video analogue of explode).
    * STUB frame extraction: frames are fixed-size byte windows of the
    * payload; a real build binds a container demuxer at the same seam.
    * Payloads fan out map-side BEFORE any shuffle, so downstream per-frame
    * ops parallelize without moving whole videos.
    */
  def sampleFrames(media: DataFrame, everyN: Int = 2, frameBytes: Int = 64): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].flatMap { row =>
      val feats = StubDecoder.decode(row)
      val nFrames = feats.n_frames
      (0 until nFrames by everyN).map { i =>
        val fromIdx = math.min(i * frameBytes, row.payload.length)
        val until   = math.min(fromIdx + frameBytes, row.payload.length)
        Frame(row.doc_id, i, feats.width, feats.height, java.util.Arrays.copyOfRange(row.payload, fromIdx, until))
      }
    }
  }

  /** Resize stub: deterministic downscale of the fake dims (a real build
    * calls the codec here); demonstrates feature transform AFTER decode,
    * still map-side.
    */
  def resize(frames: Dataset[Frame], maxDim: Int): Dataset[Frame] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.map { f =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      f.copy(
        width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt)
      )
    }
  }

  /** STUB media embedder: a deterministic `dims`-dim vector from md5 of the
    * payload (value in [0,1) per dim). The production seam binds a vision /
    * audio encoder here; everything downstream — the explode-join-aggregate
    * similarity plumbing — is the real scale path shared with the `q_sim_*`
    * family. md5-derived so the DuckDB oracle reproduces it bit-for-bit
    * (conv/hex-parse semantics match; each value is an exact n/2^32).
    */
  def embedMedia(media: DataFrame, dims: Int = 8): DataFrame =
    media.withColumn(
      "e",
      expr(
        s"transform(sequence(1, $dims), i -> cast(conv(substring(md5(concat(cast(payload as string), ':', i)), 1, 8), 16, 10) as double) / 4294967296.0)"
      )
    )

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_multimodal_embed",
      "multimodal -> vector composition: stub-embed each media payload (deterministic md5 floats behind the encoder seam), cosine-rank against a constant probe vector with decimal-exact sums — the image-similarity path end to end",
      (s, dir) => {
        val emb = embedMedia(mediaTable(s, dir))
          .select(col("doc_id"), posexplode(col("e")).as(Seq("p", "x")))
          .select(col("doc_id"), (col("p") + 1).as("d"), col("x"))
        val probe = s
          .range(1)
          .select(
            expr(
              "transform(sequence(1, 8), i -> cast(conv(substring(md5(concat('probe', ':', i)), 1, 8), 16, 10) as double) / 4294967296.0)"
            ).as("e")
          )
          .select(posexplode(col("e")).as(Seq("p", "qx")))
          .select((col("p") + 1).as("d"), col("qx"))
        emb
          .join(broadcast(probe), "d")
          .groupBy(col("doc_id"))
          .agg(
            sum((col("x") * col("qx")).cast("decimal(18,12)")).as("dot"),
            sum((col("x") * col("x")).cast("decimal(18,12)")).as("nx"),
            sum((col("qx") * col("qx")).cast("decimal(18,12)")).as("nq")
          )
          .select(
            col("doc_id"),
            round(
              col("dot").cast("double") /
                (sqrt(col("nx").cast("double")) * sqrt(col("nq").cast("double"))),
              6
            ).as("cos_sim")
          )
          .orderBy(col("cos_sim").desc, col("doc_id"))
          .limit(5)
      },
      Some("""WITH dims AS (SELECT unnest(generate_series(1, 8)) AS d),
             |emb AS (
             |  SELECT doc_id, d,
             |    ('0x' || substring(md5(text || ':' || d), 1, 8))::bigint / 4294967296.0 AS x
             |  FROM documents CROSS JOIN dims),
             |probe AS (
             |  SELECT d,
             |    ('0x' || substring(md5('probe' || ':' || d), 1, 8))::bigint / 4294967296.0 AS qx
             |  FROM dims),
             |scored AS (
             |  SELECT doc_id,
             |    sum(cast(x * qx as decimal(18,12))) AS dot,
             |    sum(cast(x * x as decimal(18,12))) AS nx,
             |    sum(cast(qx * qx as decimal(18,12))) AS nq
             |  FROM emb JOIN probe USING (d) GROUP BY 1)
             |SELECT doc_id,
             |  round(cast(cast(dot as varchar) as double)
             |        / (sqrt(cast(cast(nx as varchar) as double))
             |           * sqrt(cast(cast(nq as varchar) as double))), 6) AS cos_sim
             |FROM scored ORDER BY cos_sim DESC, doc_id LIMIT 5""".stripMargin)
    ),
    QueryDef(
      "q_multimodal_meta",
      "binary-column metadata extraction without decode: byte length + content hash + derived fake dims (pure codegen, payload never leaves the scan)",
      (s, dir) =>
        mediaTable(s, dir)
          .withColumn("sha", sha2(col("payload"), 256))
          .select(
            col("doc_id"),
            col("media_type"),
            length(col("payload")).cast("long").as("n_bytes"),
            col("sha"),
            (lit(16) + conv(substring(col("sha"), 1, 2), 16, 10).cast("long") % 240)
              .cast("long")
              .as("fake_width"),
            (lit(16) + conv(substring(col("sha"), 3, 2), 16, 10).cast("long") % 240)
              .cast("long")
              .as("fake_height")
          )
          .orderBy(col("doc_id"))
          .limit(500),
      None // replaced below after oracle string is built
    ).copy(oracle = Some(
      """SELECT doc_id, concat('image/fake-', source) AS media_type,
        |  cast(octet_length(encode(text)) as bigint) AS n_bytes,
        |  sha256(text) AS sha,
        |  cast(16 + cast(('0x' || substring(sha256(text), 1, 2))::int as bigint) % 240 as bigint) AS fake_width,
        |  cast(16 + cast(('0x' || substring(sha256(text), 3, 2))::int as bigint) % 240 as bigint) AS fake_height
        |FROM documents ORDER BY doc_id LIMIT 500""".stripMargin
    )),
    QueryDef(
      "q_multimodal_frames",
      "frame-sampling census through the typed flatMap operator (every 2nd frame of each payload): per-media count of sampled frames — the oracle recomputes the stub's frame arithmetic (n_frames = 1 + bytes % 30, sampled = ceil(n/2)) from byte lengths",
      (s, dir) => {
        val frames = sampleFrames(mediaTable(s, dir), everyN = 2, frameBytes = 64)
        frames
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_frames_sampled"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("n_frames_sampled")).cast("long").as("total_sampled"),
            max(col("n_frames_sampled")).as("max_sampled")
          )
      },
      Some("""SELECT count(1) AS n_media,
             |  cast(sum((1 + octet_length(encode(text)) % 30 + 1) // 2) as bigint) AS total_sampled,
             |  max((1 + octet_length(encode(text)) % 30 + 1) // 2) AS max_sampled
             |FROM documents""".stripMargin)
    )
  )
}
