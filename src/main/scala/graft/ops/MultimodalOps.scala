package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata derived by
  * pure expressions (size, format sniff, chunking), plus a partition-wise
  * decode stub showing the batch shape a real decoder plugs into.
  *
  * Design: the *pipeline* (schema, partitioning, per-batch iteration) is
  * real and tested. Image decode is REAL for the JDK's bundled readers
  * ([[decodeImage]]: PNG/BMP/GIF/JPEG/WBMP via `javax.imageio`); the
  * remaining codec stages (resize, feature extraction — which would need
  * ffmpeg/a model runtime) are clearly-marked deterministic STUBS whose
  * plumbing is the production contract. Swapping a stub body for an actual
  * codec (JNI/javacpp ffmpeg, TwelveMonkeys ImageIO, ...) changes no
  * plumbing.
  *
  * At 100 TB: payload bytes never shuffle — metadata extraction is a narrow
  * projection fused into the scan; the decode stage is `mapPartitions` over
  * whatever partitioning the scan produced, with one decoder context per
  * partition (not per row).
  */
object MultimodalOps {

  /** Public file-format magic numbers (hex prefix → format tag). */
  val magicPrefixes: Seq[(String, String)] = Seq(
    "89504E47" -> "png",
    "FFD8FF"   -> "jpeg",
    "47494638" -> "gif",
    "52494646" -> "riff", // wav/avi/webp container
    "25504446" -> "pdf")

  /** Format sniff from the payload's leading bytes — the standard
    * magic-number dispatch, as one codegen'd CASE over the hex of the first
    * 4 bytes.
    */
  def sniffFormat(bin: Column): Column = {
    val prefix = upper(hex(substring(bin, 1, 4)))
    magicPrefixes.foldRight(lit("bin"): Column) { case ((magic, fmt), els) =>
      when(prefix.startsWith(magic), lit(fmt)).otherwise(els)
    }
  }

  /** Payload byte length. */
  def payloadSize(bin: Column): Column = octet_length(bin)

  /** Fixed-size chunking (frame/sample windows): array of `chunkBytes`-byte
    * slices. Pure array expression — the unit a decoder or transport layer
    * consumes.
    */
  def chunks(bin: Column, chunkBytes: Int): Column =
    transform(
      sequence(lit(0), ceil(octet_length(bin).cast("double") / chunkBytes).cast("int") - 1),
      i => substring(bin, i * chunkBytes + 1, lit(chunkBytes)))

  /** Number of `chunkBytes`-byte chunks. */
  def numChunks(bin: Column, chunkBytes: Int): Column =
    ceil(octet_length(bin).cast("double") / chunkBytes).cast("int")

  /** Typed metadata projection over a binary payload column: size, sniffed
    * format, chunk count, and a 60-bit content fingerprint. One narrow map —
    * payload bytes are read once and never shuffled.
    */
  def payloadMeta(df: DataFrame, binCol: String, chunkBytes: Int = 256): DataFrame =
    df.withColumn("n_bytes", payloadSize(col(binCol)))
      .withColumn("format", sniffFormat(col(binCol)))
      .withColumn("n_chunks", numChunks(col(binCol), chunkBytes))
      .withColumn("fingerprint", DetHash.md5Hash60(col(binCol)))

  /** Deterministic demo payload used by the q31 query and its oracle: the
    * document text as UTF-8 bytes, with a rotating real magic-number header
    * prepended by doc_id so every [[sniffFormat]] arm is exercised.
    */
  def demoPayload(id: Column, text: Column): Column = {
    val body = encode(text, "UTF-8")
    when(id % 4 === 0, concat(unhex(lit("89504E47")), body))
      .when(id % 4 === 1, concat(unhex(lit("FFD8FFE0")), body))
      .when(id % 4 === 2, concat(unhex(lit("47494638")), body))
      .otherwise(body)
  }

  /** Decoded-image record produced by the decode stage. */
  final case class DecodedImage(id: Long, width: Int, height: Int,
                                channels: Int, meanPixel: Double)

  val decodedSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("meanPixel", DoubleType, nullable = false)))

  /** STUB decoder: deterministic fake "image decode" — dimensions and mean
    * pixel derived from the payload bytes, NOT a real codec. The plumbing
    * around it is the real contract: `mapPartitions` so a production decoder
    * initializes once per partition and streams rows; input stays
    * (id, bytes); output is a typed Dataset with a fixed schema.
    */
  def decodeImageStub(df: DataFrame, idCol: String, binCol: String): Dataset[DecodedImage] = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    input.mapPartitions { rows =>
      // real impl: val decoder = Codec.open() once here, closed at end
      rows.map { case (id, bytes) =>
        val n = bytes.length
        // STUB: fabricate deterministic dims/stats from the bytes
        val w = 1 + math.abs(if (n > 0) bytes(0).toInt else 0) % 64
        val h = 1 + math.abs(if (n > 1) bytes(1).toInt else 0) % 64
        val mean = if (n == 0) 0.0 else bytes.iterator.map(b => (b & 0xff).toDouble).sum / n
        DecodedImage(id, w, h, 3, mean)
      }
    }(Encoders.product[DecodedImage])
  }

  /** REAL image decode for the formats the JDK ships readers for (PNG, BMP,
    * GIF, JPEG, WBMP) — `javax.imageio.ImageIO`, zero new dependencies. Same
    * contract and output schema as [[decodeImageStub]] (which remains the
    * deterministic fake for formats without a bundled codec): mapPartitions
    * so reader setup happens once per partition, payload bytes never
    * shuffle, typed `Dataset[DecodedImage]` out. `channels` is the raster
    * band count (3 = RGB, 4 = RGBA, 1 = gray), `meanPixel` the mean sample
    * value over every band of every pixel (0-255 scale).
    *
    * Rows whose payload no JDK reader accepts (truncated bytes, formats
    * like webp/avif, non-images) are DROPPED — decode is a filter+map, the
    * usual ingest semantics. Run [[payloadMeta]] first when the drop count
    * needs auditing; the in-memory `ImageIO` cache setting avoids executor
    * tmp-file churn.
    */
  def decodeImage(df: DataFrame, idCol: String, binCol: String): Dataset[DecodedImage] = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    input.mapPartitions { rows =>
      // per-partition decoder setup: in-memory stream cache, no tmp files
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { case (id, bytes) =>
        // NonFatal, not just IOException: JDK readers throw runtime
        // exceptions on corrupt-but-recognized payloads (truncated IHDR,
        // hostile dimensions), and a NULL payload must drop, not NPE a task
        val img =
          if (bytes == null) None
          else try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          catch { case scala.util.control.NonFatal(_) => None }
        img.map { im =>
          val raster = im.getRaster
          val (w, h, bands) = (im.getWidth, im.getHeight, raster.getNumBands)
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < bands) { sum += raster.getSampleDouble(x, y, b); b += 1 }
              x += 1
            }
            y += 1
          }
          DecodedImage(id, w, h, bands, sum / (w.toLong * h * bands))
        }
      }
    }(Encoders.product[DecodedImage])
  }

  /** Resized-payload record: id, target dims, re-encoded bytes. */
  final case class ResizedImage(id: Long, width: Int, height: Int, payload: Array[Byte])

  /** STUB resize stage: (id, bytes) → (id, targetW, targetH, bytes'). The
    * plumbing is the production contract — mapPartitions (one scaler context
    * per partition), binary in/binary out so stages chain, target dims as
    * driver-side config baked into the closure. The "resize" itself is a
    * deterministic byte subsample, NOT a real scaler (no codec libs in this
    * environment); a real impl replaces only the loop body.
    */
  def resizeImageStub(df: DataFrame, idCol: String, binCol: String,
                      targetW: Int, targetH: Int): Dataset[ResizedImage] = {
    val input = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    input.mapPartitions { rows =>
      // real impl: scaler context opens once here
      val outLen = targetW * targetH
      rows.map { case (id, bytes) =>
        // STUB: deterministic subsample to outLen bytes (stride sampling —
        // the access pattern a nearest-neighbor downscale would have)
        val out = new Array[Byte](outLen)
        if (bytes.nonEmpty) {
          var i = 0
          while (i < outLen) { out(i) = bytes((i.toLong * bytes.length / outLen).toInt); i += 1 }
        }
        ResizedImage(id, targetW, targetH, out)
      }
    }(Encoders.product[ResizedImage])
  }

  /** STUB feature extraction: decoded/resized payload → a `dim`-wide float
    * embedding, the stage that feeds [[SimilarityOps]] (ANN, near-dup) from
    * multimodal data. Embeddings are a deterministic byte-histogram
    * projection, NOT a real model; the contract — mapPartitions batching,
    * one model context per partition, `array<float>` output compatible with
    * every SimilarityOps operator — is real.
    */
  def extractFeaturesStub(df: DataFrame, idCol: String, binCol: String,
                          dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val input = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    input.mapPartitions { rows =>
      // real impl: model session loads once here
      rows.map { case (id, bytes) =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) { v((bytes(i) & 0xff) % dim) += 1.0f; i += 1 }
        val n = math.max(bytes.length, 1).toFloat
        var j = 0
        while (j < dim) { v(j) /= n; j += 1 }
        (id, v)
      }
    }.toDF(idCol, "embedding")
  }

  /** Frame sampling: every `everyN`-th fixed-size chunk (a video keyframe /
    * audio window subsample pattern). Pure array expression over
    * [[chunks]] — no decode needed to thin a payload before shipping it to
    * an expensive stage.
    */
  def sampleFrames(bin: Column, frameBytes: Int, everyN: Int): Column =
    filter(chunks(bin, frameBytes), (_, i) => i % everyN === 0)
}
