package graft

import graft.llm.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Real-decode path: binary Netpbm P6 images parsed by the pure-Scala
  * decoder, with hand-computed feature expectations; malformed payloads
  * must fall back to the deterministic stub, never throw.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** P6 with a comment in the header; 2x2 RGB. */
  private def ppm(pixels: Array[Int], w: Int = 2, h: Int = 2,
                  maxval: Int = 255): Array[Byte] = {
    val header = s"P6\n# test fixture\n$w $h\n$maxval\n".getBytes("ASCII")
    header ++ pixels.map(_.toByte)
  }

  test("decodePpm parses header, comments, and raster") {
    val img = Multimodal.decodePpm(ppm(Array(
      255, 0, 0, /**/ 0, 255, 0,
      0, 0, 255, /**/ 255, 255, 255))).get
    assert(img.width == 2 && img.height == 2 && img.maxval == 255)
    assert(img.rgb.length == 12)
    assert((img.rgb(0) & 0xff) == 255 && (img.rgb(4) & 0xff) == 255)
  }

  test("ppm features: channel means, luma mean, histogram") {
    val payload = ppm(Array(
      255, 0, 0, 0, 255, 0,
      0, 0, 255, 255, 255, 255))
    val f = Multimodal.decode(7L, payload)
    assert(f.width == 2 && f.height == 2 && f.n_frames == 1)
    assert(f.n_bytes == payload.length)
    // each channel: 2 pixels at 255 of 4 -> mean 510/(4*255) = 0.5
    assert(math.abs(f.features(0) - 0.5f) < 1e-6)
    assert(math.abs(f.features(1) - 0.5f) < 1e-6)
    assert(math.abs(f.features(2) - 0.5f) < 1e-6)
    // integer luma: red 76, green 149, blue 29, white 255 -> sum 509
    assert(math.abs(f.features(3) - 509.0 / (4 * 255)) < 1e-6)
    // luma bins (maxval 255, bin = luma*4/256): 76->1, 149->2, 29->0,
    // 255->3 — one pixel per bin
    (4 until 8).foreach(i => assert(f.features(i) == 0.25f))
  }

  test("malformed payloads fall back to the stub, never throw") {
    val truncated = ppm(Array(255, 0, 0)) // claims 2x2, has 1 pixel
    val f = Multimodal.decode(3L, truncated)
    // stub dimensions, not PPM header dimensions
    assert(f.width == 16 + 3 && f.height == 16 + (3 * 7) % 32)
    val textPayload = "key agg row scan".getBytes("UTF-8")
    assert(Multimodal.decodePpm(textPayload).isEmpty)
    val wideMaxval = "P6\n2 2\n65535\n".getBytes("ASCII") ++
      new Array[Byte](24)
    assert(Multimodal.decodePpm(wideMaxval).isEmpty)
  }

  test("extractFeaturesBin routes per payload inside one frame") {
    import spark.implicits._
    val good = ppm(Array(
      10, 20, 30, 10, 20, 30,
      10, 20, 30, 10, 20, 30))
    val rows = Seq(
      (0L, good),
      (1L, "not an image".getBytes("UTF-8")))
    val out = Multimodal
      .extractFeaturesBin(rows.toDF("doc_id", "payload"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(0L).width == 2 && out(0L).height == 2)
    assert(math.abs(out(0L).features(0) - 40.0 / (4 * 255)) < 1e-6)
    assert(out(1L).width == 16 + 1) // stub path
  }

  test("decodePixelsStub: stride-64 byte sums mod 256") {
    // payload of 130 bytes: positions 0 and 64 and 128 fold into
    // pixel 0; position 1, 65, 129 into pixel 1; etc.
    val payload = Array.tabulate[Byte](130)(i => (i % 100).toByte)
    val pix = Multimodal.decodePixelsStub(payload)
    assert(pix.length == 64)
    assert(pix(0) == (0 + 64 + (128 % 100)) % 256)
    assert(pix(1) == (1 + 65 + (129 % 100)) % 256)
    assert(pix(2) == (2 + 66) % 256)
    // empty payload: all-zero pixels, all-zero hash bits
    assert(Multimodal.decodePixelsStub(Array.emptyByteArray)
      .forall(_ == 0))
  }

  test("perceptualHash deterministic; identical payloads hash " +
    "identically and near-dup finds them at hamming 0") {
    import spark.implicits._
    val text = ("the quick brown fox jumps over the lazy dog " * 20)
    val docs = Seq(
      (1L, text), (2L, text),           // exact pair
      (3L, "completely different content " * 30))
      .toDF("doc_id", "text")
    val h = Multimodal.perceptualHash(docs).collect()
      .map(p => p.doc_id -> ((p.b0, p.b1, p.b2, p.b3))).toMap
    assert(h(1L) == h(2L))
    assert(h.values.forall { case (b0, b1, b2, b3) =>
      Seq(b0, b1, b2, b3).forall(b => b >= 0 && b < 65536) })
    val pairs = Multimodal.phashNearDup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L)), s"got ${pairs.toSeq}")
  }

  test("phash hot-bucket cap: the mass-duplicate bucket is excluded, " +
    "sparse pairs kept, cap=0 is the identity") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter now " * 10
    val organic = "the quick brown fox jumps over the lazy dog " * 20
    // 40 identical boilerplate docs (ids 10..49, one 4-band bucket of
    // 40) + one organic near-dup pair (ids 1, 2)
    val docs = (Seq((1L, organic), (2L, organic)) ++
      (10L until 50L).map(i => (i, boiler)))
      .toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc1", "doc2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Multimodal.phashNearDup(docs))
    val capped = pairs(Multimodal.phashNearDup(docs, hotBucketCap = 8))
    assert(uncapped.count(p => p._1 >= 10 && p._2 >= 10) ==
      40 * 39 / 2, "the uncapped run carries C(40,2) hot pairs")
    assert(capped == Set((1L, 2L)),
      s"cap keeps only the sparse organic pair, got $capped")
    assert(pairs(Multimodal.phashNearDup(docs, hotBucketCap = 0))
      == uncapped, "cap=0 must be the identity")
  }
}
