package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads with typed
  * metadata, batch-shaped decode/feature-extract over partitions.
  *
  * The decode step is REAL for the one raster format that needs no
  * codec library — binary Netpbm P6 (`decodePpm`, the public PPM spec:
  * "P6", whitespace/#-comment-separated width/height/maxval header,
  * then raw RGB bytes) — and a clearly-marked DETERMINISTIC STUB for
  * compressed containers (JPEG/WAV/MP4), which the sandbox has no
  * codecs for. Payloads route by magic number; either way the
  * Spark-side shape is the part that matters at 100 TB: binary stays
  * columnar until the partition iterator (the Scala analogue of
  * `mapInPandas` — one iterator in, batched feature rows out, no
  * per-row JVM boundary crossing), and features come back as a typed
  * Dataset.
  */
object Multimodal {

  /** A decoded media batch row: fixed metadata + a small feature vector. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
                           height: Int, n_frames: Int,
                           features: Array[Float])

  /** STUB decode: a real implementation would parse the container format
    * (JPEG/WAV/MP4) from the byte payload. This deterministic fake derives
    * plausible metadata and an 8-dim "feature vector" from the bytes so
    * the pipeline shape is end-to-end testable.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val n = payload.length.toLong
    val w = 16 + (docId % 32).toInt
    val h = 16 + ((docId * 7) % 32).toInt
    val frames = 1 + (docId % 4).toInt
    val feats = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < payload.length) { acc += payload(j) & 0xff; j += 8 }
      (acc % 1024).toFloat / 1024f
    }
    MediaFeatures(docId, n, w, h, frames, feats)
  }

  /** Parsed P6 image: dimensions, sample maxval, raw RGB bytes. */
  final case class Ppm(width: Int, height: Int, maxval: Int,
                       rgb: Array[Byte])

  /** Parse a binary-Netpbm P6 payload per the public spec: magic "P6",
    * then width/height/maxval as ASCII decimals separated by
    * whitespace and `#` comments, ONE whitespace byte, then
    * width·height·3 raw sample bytes. Returns None — never throws — on
    * anything malformed (wrong magic, short pixel data, multi-byte
    * maxval ≥ 256), so callers can fall back instead of poisoning a
    * batch.
    */
  def decodePpm(payload: Array[Byte]): Option[Ppm] = {
    if (payload.length < 2 || payload(0) != 'P'.toByte ||
      payload(1) != '6'.toByte) return None
    var pos = 2
    def isWs(b: Byte) =
      b == ' '.toByte || b == '\n'.toByte || b == '\r'.toByte ||
        b == '\t'.toByte || b == '\f'.toByte || b == 0x0b.toByte
    def readInt(): Int = {
      var skipping = true
      while (skipping && pos < payload.length) {
        if (payload(pos) == '#'.toByte)
          while (pos < payload.length && payload(pos) != '\n'.toByte)
            pos += 1
        else if (isWs(payload(pos))) pos += 1
        else skipping = false
      }
      var v = -1L
      while (pos < payload.length && payload(pos) >= '0'.toByte &&
        payload(pos) <= '9'.toByte && v <= Int.MaxValue) {
        v = math.max(v, 0) * 10 + (payload(pos) - '0'.toByte)
        pos += 1
      }
      if (v < 0 || v > Int.MaxValue) -1 else v.toInt
    }
    val w = readInt()
    val h = readInt()
    val mx = readInt()
    if (w <= 0 || h <= 0 || mx <= 0 || mx >= 256) return None
    // exactly one whitespace byte separates maxval from the raster
    if (pos >= payload.length || !isWs(payload(pos))) return None
    pos += 1
    val need = w.toLong * h * 3
    if (payload.length - pos < need) None
    else Some(Ppm(w, h, mx,
      java.util.Arrays.copyOfRange(payload, pos, pos + need.toInt)))
  }

  /** Features from a decoded P6 image: per-channel means, integer-BT.601
    * luma mean, and a 4-bin luma histogram — all normalised to [0, 1]
    * with deterministic integer accumulation.
    */
  def ppmFeatures(docId: Long, nBytes: Long, img: Ppm): MediaFeatures = {
    val n = img.width * img.height
    var (sr, sg, sb, sl) = (0L, 0L, 0L, 0L)
    val bins = new Array[Long](4)
    var i = 0
    while (i < n) {
      // clamp to maxval: a raster byte above the declared maxval is
      // legal to PARSE but would push a "normalised" mean past 1.0 and
      // silently alias into the top histogram bin
      val r = math.min(img.rgb(3 * i) & 0xff, img.maxval)
      val g = math.min(img.rgb(3 * i + 1) & 0xff, img.maxval)
      val b = math.min(img.rgb(3 * i + 2) & 0xff, img.maxval)
      val luma = (r * 299 + g * 587 + b * 114) / 1000
      sr += r; sg += g; sb += b; sl += luma
      bins(math.min(luma * 4 / (img.maxval + 1), 3)) += 1
      i += 1
    }
    val d = n.toDouble * img.maxval
    MediaFeatures(docId, nBytes, img.width, img.height, 1,
      Array(
        (sr / d).toFloat, (sg / d).toFloat, (sb / d).toFloat,
        (sl / d).toFloat,
        (bins(0).toDouble / n).toFloat, (bins(1).toDouble / n).toFloat,
        (bins(2).toDouble / n).toFloat, (bins(3).toDouble / n).toFloat))
  }

  /** Route one payload by magic number: real P6 decode when the bytes
    * are a well-formed PPM, deterministic stub otherwise.
    */
  def decode(docId: Long, payload: Array[Byte]): MediaFeatures =
    decodePpm(payload) match {
      case Some(img) => ppmFeatures(docId, payload.length.toLong, img)
      case None => decodeStub(docId, payload)
    }

  /** Run the decoder per partition in batches over a
    * `(doc_id, payload binary)` frame. The physical shape is the one
    * that matters at 100 TB: binary stays columnar until the partition
    * iterator, features come back as a typed Dataset.
    */
  def extractFeaturesBin(binDocs: DataFrame,
                         decoder: (Long, Array[Byte]) => MediaFeatures =
                           decode): Dataset[MediaFeatures] = {
    val spark = binDocs.sparkSession
    import spark.implicits._
    binDocs.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch loop: each batch would be handed to a native decoder in
        // one call in a codec-backed deployment
        it.grouped(64).flatMap(_.map { case (id, bytes) =>
          decoder(id, bytes)
        })
      }
  }

  /** Treat `text` as the opaque binary payload column (the synthetic
    * corpus's stand-in for a media column). The `decoder` default is
    * the magic-number router; the stub-gated driver queries pin
    * [[decodeStub]] explicitly so their oracle contract cannot drift
    * if a payload happens to parse as a real format.
    */
  def extractFeatures(docs: DataFrame,
                      decoder: (Long, Array[Byte]) => MediaFeatures =
                        decode): Dataset[MediaFeatures] =
    extractFeaturesBin(docs.select(col("doc_id"),
      col("text").cast("binary").as("payload")), decoder)

  /** Metadata-only projection (oracle-checkable): byte length + stub
    * dimensions, no decode.
    */
  def metadata(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
      (lit(16) + col("doc_id") % 32).cast("long").as("stub_w"),
      (lit(16) + (col("doc_id") * 7) % 32).cast("long").as("stub_h"),
      (lit(1) + col("doc_id") % 4).cast("long").as("n_frames"))

  /** Frame sampling: one output row per kept frame (every `everyN`-th,
    * frame 0 always kept) — the explode-shaped video preprocessing step.
    * The frame PAYLOAD extraction is the codec-backed part a real
    * deployment plugs into [[extractFeatures]]'s batch loop; the
    * dataflow (per-frame fan-out, metadata carry) is the Spark-side
    * contract and is fully gated.
    */
  def frameSample(docs: DataFrame, everyN: Int = 2): DataFrame =
    metadata(docs).select(col("doc_id"), col("n_frames"),
      explode(expr(s"sequence(0L, n_frames - 1, $everyN)"))
        .as("frame_idx"))

  /** Resize planning: target dimensions + exact rational scale factors
    * per document (the shape every batch image-resize kernel consumes;
    * the pixel transform itself is the stubbed codec step). Scales are
    * rounded to 6 dp for cross-engine hashing.
    */
  def resizePlan(docs: DataFrame, outW: Int = 224,
                 outH: Int = 224): DataFrame =
    metadata(docs).select(
      col("doc_id"), col("stub_w"), col("stub_h"),
      lit(outW.toLong).as("out_w"), lit(outH.toLong).as("out_h"),
      round(lit(outW.toDouble) / col("stub_w").cast("double"), 6)
        .as("scale_x"),
      round(lit(outH.toDouble) / col("stub_h").cast("double"), 6)
        .as("scale_y"))

  /** A 64-bit perceptual hash as four 16-bit bands. */
  final case class PHash(doc_id: Long, b0: Int, b1: Int, b2: Int,
                         b3: Int)

  /** STUB 64-pixel "grayscale thumbnail": byte sums at stride-64
    * positions mod 256. A codec-backed deployment replaces this with
    * a real decode + 8×8 luma downsample; the hash/band/join shape
    * downstream is unchanged (same honesty contract as
    * [[decodeStub]]).
    */
  def decodePixelsStub(payload: Array[Byte]): Array[Int] = {
    val pix = new Array[Long](64)
    var j = 0
    while (j < payload.length) {
      pix(j % 64) += payload(j) & 0xff
      j += 1
    }
    pix.map(p => (p % 256).toInt)
  }

  /** Average-hash (aHash) over the 64 stub pixels: bit i set iff
    * pixel_i exceeds the mean (strict integer compare
    * `pixel·64 > sum`, so both engines agree exactly), packed as four
    * 16-bit bands — the banding is the LSH key for
    * [[phashNearDup]], and 4×16 avoids 64-bit sign-overflow
    * differences across engines.
    */
  def perceptualHash(docs: DataFrame): Dataset[PHash] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val pix = decodePixelsStub(payload)
          val s = pix.map(_.toLong).sum
          val bits = pix.map(p => if (p * 64L > s) 1 else 0)
          def band(k: Int): Int =
            (0 until 16).map(i => bits(16 * k + i) << i).sum
          PHash(id, band(0), band(1), band(2), band(3))
        }
      }
  }

  /** Perceptual-hash near-duplicate pairs — the standard image-dedup
    * shape: candidate pairs share at least one EXACT 16-bit band
    * (banded LSH, the same recall structure as MinHash banding), then
    * the exact 64-bit Hamming distance verifies candidates only.
    *
    * 100 TB shape: the hash is one mapPartitions pass; the candidate
    * join is bucketed on (band_idx, band_val) — never all-pairs; the
    * verify join touches candidates only. The hash frame feeds four
    * band projections + two verify sides, so it materialises ONCE via
    * a plan-private lazy localCheckpoint — never `.cache()`, which
    * would register a corpus-scale frame in the session CacheManager
    * (undeclared memory pinning + silent substitution into later
    * queries; see graft.llm.Dedup.hashedShingles).
    */
  def phashNearDup(docs: DataFrame, maxDist: Int = 6,
                   hotBucketCap: Int = Dedup.DerivedCap): DataFrame = {
    require(hotBucketCap >= 0 || hotBucketCap == Dedup.DerivedCap,
      s"hotBucketCap must be >= 0 (0 = explicitly off) or " +
        s"Dedup.DerivedCap (${Dedup.DerivedCap}); got $hotBucketCap")
    val ph = perceptualHash(docs).toDF().localCheckpoint(eager = false)
    val allBands = (0 to 3).map { k =>
      ph.select(col("doc_id"), lit(k).as("band_idx"),
        col(s"b$k").as("band_val"))
    }.reduce(_ unionByName _)
    // production skew guard, same rationale as Dedup.lshCandidates:
    // a band bucket whose occupancy grows with the corpus contributes
    // C(m, 2) pairs — quadratic at scale (the 16-bit pHash bands are
    // low-entropy on near-uniform corpora; measured 28x at 10x data,
    // SCALE.md round-18). Over-cap buckets are the mass-duplicate
    // class the exact-dedup/census operators already handle linearly.
    // Default = Dedup.DerivedCap (greatest(64, ceil(sqrt(n))) derived
    // in-plan); pass 0 to disable explicitly (the q_m5 stress gate
    // does, to keep measuring the unguarded shape).
    val bands =
      if (hotBucketCap == 0) allBands
      else {
        val sizes = allBands.groupBy("band_idx", "band_val")
          .agg(count(lit(1)).as("__bucket_n"))
        val capped =
          if (hotBucketCap > 0)
            sizes.where(col("__bucket_n") <= hotBucketCap)
          else
            sizes.crossJoin(broadcast(
                ph.select(count(lit(1)).as("__n_docs"))))
              .where(col("__bucket_n") <= greatest(
                lit(Dedup.MinDerivedCap.toLong),
                ceil(sqrt(col("__n_docs")))))
        allBands.join(capped.select("band_idx", "band_val"),
          Seq("band_idx", "band_val"))
      }
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
    cand
      .join(ph.select(col("doc_id").as("doc1"), col("b0").as("a0"),
        col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")),
        "doc1")
      .join(ph.select(col("doc_id").as("doc2"), col("b0").as("c0"),
        col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")),
        "doc2")
      .withColumn("hamming", expr(
        "CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)"))
      .where(col("hamming") <= maxDist)
      .select("doc1", "doc2", "hamming")
  }
}
