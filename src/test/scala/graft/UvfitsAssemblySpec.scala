package graft

import java.net.URI
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import graft.model.Dims
import graft.ops._
import graft.sinks.UvfitsWriter
import graft.synth.VisSynth
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A local filesystem that ADVERTISES concat (like HDFS): stitches the
  * sources onto the target inside the filesystem layer and counts the
  * calls — so the spec can prove the writer takes the metadata-style
  * route and never enters its own driver byte loop.
  */
class ConcatLocalFs extends RawLocalFileSystem {
  override def getScheme: String = "graftconcat"
  override def getUri: URI = URI.create("graftconcat:///")
  override def concat(trg: Path, psrcs: Array[Path]): Unit = {
    ConcatLocalFs.calls.incrementAndGet()
    val out = appendFile(trg).build()
    psrcs.foreach { p =>
      val in = open(p)
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 1 << 16, false)
      in.close()
      delete(p, false)
    }
    out.close()
  }
}

object ConcatLocalFs {
  val calls = new AtomicInteger(0)
}

/** FileContext binding for the same scheme (the executor-side rename
  * goes through FileContext, which has its own registry).
  */
class ConcatLocalAfs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new ConcatLocalFs, conf,
      "graftconcat", false)

/** The uvfits single-file tail: on a concat-capable filesystem the
  * assembly is metadata-only (one concat call, zero driver byte
  * traffic); on a plain local filesystem it falls back to the streamed
  * copy. BENCH_NOTES.md documents the object-store (multipart) route.
  */
class UvfitsAssemblySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val hc = s.sparkContext.hadoopConfiguration
    hc.set("fs.graftconcat.impl", classOf[ConcatLocalFs].getName)
    hc.set("fs.AbstractFileSystem.graftconcat.impl",
      classOf[ConcatLocalAfs].getName)
    s
  }

  private def avgFrame = {
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark)))
    Averaging.avgTimeFreq(weighted, 2, 2)
  }

  test("concat-capable FS: assembly is metadata-only, no driver loop") {
    val dir = Files.createTempDirectory("uvf_concat")
    val out = s"graftconcat://${dir.toString}/concat.uvfits"
    ConcatLocalFs.calls.set(0)
    val n = UvfitsWriter.write(avgFrame, out)
    assert(n > 0)
    assert(UvfitsWriter.lastAssemblyRoute == "concat",
      s"expected concat route, took ${UvfitsWriter.lastAssemblyRoute}")
    assert(ConcatLocalFs.calls.get() == 1,
      s"exactly one concat call, got ${ConcatLocalFs.calls.get()}")
    // the stitched file is a well-formed FITS: block-aligned with the
    // declared group count
    val bytes = Files.readAllBytes(Paths.get(dir.toString,
      "concat.uvfits"))
    assert(bytes.length % 2880 == 0)
    assert(new String(bytes.take(2880), "ASCII")
      .contains(s"GCOUNT  =" + " " * (21 - n.toString.length) + n))
  }

  test("plain local FS: falls back to the streamed copy") {
    val dir = Files.createTempDirectory("uvf_stream")
    val out = dir.toString + "/stream.uvfits"
    val n = UvfitsWriter.write(avgFrame, out)
    assert(n > 0)
    assert(UvfitsWriter.lastAssemblyRoute == "stream")
    assert(Files.size(Paths.get(out)) % 2880 == 0)
  }
}
