package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct, exactly as a 100 TB
  * training pipeline carries them (decode happens late, next to the
  * consumer, never at ingest).
  *
  * The actual media decode is STUBBED — codec libraries are not in this
  * container — behind `decodeStub`, which produces a deterministic fake.
  * Everything around it is real and tested: the schema contract, the
  * mapPartitions batching (one decoder instance per partition, rows
  * streamed through it), and the column-level metadata extraction.
  */
object Multimodal {

  /** Canonical schema for a multimodal asset column family. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true)
    )), nullable = true)
  ))

  /** Wrap any (id, binary) DataFrame into the asset contract, deriving
    * cheap metadata from the payload header bytes — pure column exprs,
    * no decode.
    */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).as("payload"),
      struct(
        length(col(payloadCol)).cast("int").as("byte_len"),
        // header-derived fake dimensions (see decodeStub): bytes 1-2 and 3-4
        (conv(hex(substring(col(payloadCol), 1, 2)), 16, 10).cast("int") % 1920).as("width"),
        (conv(hex(substring(col(payloadCol), 3, 2)), 16, 10).cast("int") % 1080).as("height"),
        (conv(hex(substring(col(payloadCol), 5, 1)), 16, 10).cast("int") % 4 + 1).as("channels")
      ).as("meta")
    )

  /** The decode seam. A real deployment plugs a codec here (JNI/FFI, one
    * instance per partition). The stub derives deterministic "features"
    * from the payload bytes so the plumbing is testable end-to-end.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    // ??? <- real image/audio decode goes here; deterministic fake instead:
    if (payload == null || payload.isEmpty) Array.fill(8)(0.0f)
    else {
      val out = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        out(i % 8) = out(i % 8) + (payload(i) & 0xFF).toFloat / 255.0f
        i += 1
      }
      out
    }
  }

  /** Frame sampling for video-typed assets: one output row per sampled
    * frame, every `step`-th frame of `frameSize` bytes. Pure column
    * exprs (sequence → posexplode + substring) — the fan-out is
    * distributed and codegen'd, no driver loop, no decode; the emitted
    * "frame" is exactly the payload slice a real codec would decode.
    */
  def sampleFrames(assets: DataFrame, frameSize: Int, step: Int): DataFrame =
    assets
      .withColumn("__n_frames", (col("meta.byte_len") / frameSize).cast("int"))
      .filter(col("__n_frames") > 0)
      .select(col("asset_id"), col("media_type"), col("payload"),
        posexplode(sequence(lit(0), col("__n_frames") - 1, lit(step)))
          .as(Seq("frame_rank", "frame_idx")))
      .select(
        col("asset_id"), col("frame_rank"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameSize + 1, lit(frameSize)).as("frame"))

  /** Audio framing for audio-typed assets: OVERLAPPING `windowSize`-byte
    * windows every `hop` bytes — the STFT/filterbank framing a speech
    * pipeline applies before feature extraction (sampleFrames' disjoint
    * stride doesn't overlap; spectral features need hop < window). Same
    * distributed sequence → posexplode fan-out, no decode, no driver loop.
    */
  def audioWindows(assets: DataFrame, windowSize: Int, hop: Int): DataFrame =
    assets
      .filter(col("meta.byte_len") >= windowSize)
      .withColumn("__n_win",
        ((col("meta.byte_len") - windowSize) / hop).cast("int") + 1)
      .select(col("asset_id"), col("payload"),
        posexplode(sequence(lit(0), (col("__n_win") - 1) * hop, lit(hop)))
          .as(Seq("win_rank", "start_byte")))
      .select(col("asset_id"), col("win_rank"), col("start_byte"),
        col("payload").substr(col("start_byte") + 1, lit(windowSize)).as("window"))

  /** ViT-style patch-grid geometry from asset metadata: how many
    * `patchSize`×`patchSize` patches an image tiles into after
    * right/bottom zero-padding to a patch multiple — the numbers a
    * vision-tower preprocessor needs to budget sequence length
    * (n_patches is the image's token count) and allocate the padded
    * canvas. Pure integer column math on the meta struct; the payload is
    * never touched, so the planner prunes it from the scan entirely.
    */
  def patchGrid(assets: DataFrame, patchSize: Int): DataFrame = {
    require(patchSize > 0, "patchSize must be positive")
    val nx = ceil(col("meta.width").cast("double") / patchSize).cast("int")
    val ny = ceil(col("meta.height").cast("double") / patchSize).cast("int")
    assets
      .filter(col("meta.width") > 0 && col("meta.height") > 0)
      .select(col("asset_id"),
        nx.as("patches_x"), ny.as("patches_y"),
        (nx * ny).as("n_patches"),
        (nx * patchSize - col("meta.width")).as("pad_x"),
        (ny * patchSize - col("meta.height")).as("pad_y"))
  }

  /** Resize seam: a real deployment decodes, scales, re-encodes per
    * partition (codec initialized once); the stub rewrites the metadata and
    * keeps the payload, exercising the identical mapPartitions plumbing.
    */
  def resizeStub(spark: SparkSession, assets: DataFrame, width: Int, height: Int): DataFrame = {
    val schema     = assets.schema
    val payloadIdx = schema.fieldIndex("payload")
    val metaIdx    = schema.fieldIndex("meta")
    assets.mapPartitions { rows =>
      // per-partition codec init would happen here (??? <- real resize)
      rows.map { r =>
        val meta = r.getStruct(metaIdx)
        val newMeta = Row(meta.get(0), width, height, meta.get(3))
        Row.fromSeq(r.toSeq.updated(metaIdx, newMeta))
      }
    }(Encoders.row(schema))
  }

  /** Feature extraction over asset batches: mapPartitions so the (stubbed)
    * decoder is initialized once per partition and rows stream through —
    * the Scala analogue of a Pandas UDF over mapInPandas, same batch shape.
    */
  def extractFeatures(spark: SparkSession, assets: DataFrame): DataFrame = {
    val outSchema = StructType(assets.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { rows =>
      // per-partition decoder init would happen here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(r.toSeq :+ decodeStub(payload).toSeq)
      }
    }(Encoders.row(outSchema))
  }
}
