package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4 `correct_coarse_passband_gains`
  * (/root/reference/src/corrections.rs:453-522).
  *
  * Two halves, exactly as the reference splits them:
  *  1. [[scrunchGains]] — a pure driver-side function collapsing the
  *     ultrafine published PFB gain table to the observation's
  *     fine-channel resolution (corrections.rs:576-646);
  *  2. application — per fine-chan-in-coarse: vis /= gain,
  *     weight *= gain (corrections.rs:504-519), a broadcast join on the
  *     8-row scrunched-gain dimension + division/multiply expressions.
  */
object PassbandGains {

  /** Port of `scrunch_gains` (corrections.rs:576-646).
    *
    * - `Simple` (legacy correlator): plain mean over each contiguous
    *   window of `factor` ultrafine gains.
    * - `CenterSymmetric` (MWAX): windows are centred on the output
    *   channel, wrap around the coarse channel, and half-weight their two
    *   edge samples; odd factors take (factor+1) samples with the two
    *   outermost at weight 1/2, even factors take (factor+1) samples with
    *   the ends at 1/2 (corrections.rs:606-630 odd/even cases).
    */
  def scrunchGains(ultrafine: Array[Double], fscrunch: Int,
                   centerSymmetric: Boolean): Array[Double] = {
    val n = ultrafine.length
    require(n % fscrunch == 0, s"$n not divisible by $fscrunch")
    val out = n / fscrunch
    if (!centerSymmetric) {
      Array.tabulate(out) { o =>
        var s = 0.0
        var i = 0
        while (i < fscrunch) { s += ultrafine(o * fscrunch + i); i += 1 }
        s / fscrunch
      }
    } else {
      // window of fscrunch+1 samples centred on o*fscrunch (wrapping),
      // outermost two samples weighted 1/2 — total weight = fscrunch.
      Array.tabulate(out) { o =>
        val centre = o * fscrunch
        val half = fscrunch / 2
        var s = 0.0
        val lo = centre - half
        val hi = centre + fscrunch - half // lo..hi inclusive = fscrunch+1
        var i = lo
        while (i <= hi) {
          val idx = ((i % n) + n) % n
          val wgt = if (i == lo || i == hi) 0.5 else 1.0
          s += wgt * ultrafine(idx)
          i += 1
        }
        s / fscrunch
      }
    }
  }

  /** Apply scrunched per-fine-chan gains: vis /= gain, weight *= gain.
    * `pfbGain` provides (fc, pfb_gain).
    */
  def apply(vis: DataFrame, pfbGain: DataFrame): DataFrame = {
    val joined = vis.join(broadcast(pfbGain), Seq("fc"))
    val divided = (0 until 8).foldLeft(joined) { (df, k) =>
      df.withColumn(s"v$k", col(s"v$k") / col("pfb_gain"))
    }
    val weighted =
      if (divided.columns.contains("weight"))
        divided.withColumn("weight", col("weight") * col("pfb_gain"))
      else divided
    weighted.drop("pfb_gain")
  }
}
