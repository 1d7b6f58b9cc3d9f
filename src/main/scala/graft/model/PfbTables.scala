package graft.model

/** The published MWA polyphase-filter-bank passband gain tables and the
  * correlator-version auto-selection logic.
  *
  * Tables are the public measured constants from the reference
  * (/root/reference/src/passband_gains.rs:9 `PFB_JAKE_2022_200HZ`,
  * :6415 `OSPFB_JAKE_2025_200HZ`, :12826 `PFB_COTTER_2014_10KHZ` —
  * derived from the published RRI prototype-filter data; see the MWA
  * wiki pages cited there), shipped as one-value-per-line resources so
  * no 6400-literal method body hits JVM bytecode limits. Like
  * [[graft.functions.VanVleckVectors]], this is deliberate DATA reuse
  * declared in SURVEY §5 — numeric parity with real observations is
  * impossible without the measured constants.
  *
  * Selection mirrors `--passband-gains auto`
  * (/root/reference/src/cli.rs:1401-1443): deripple already applied →
  * none; MWAX v2 → Jake 2022 (or the 2025 oversampled variant); legacy
  * correlators → Cotter 2014. Scrunch flavour mirrors
  * `ScrunchType::from_mwa_version`
  * (/root/reference/src/corrections.rs:534-547): MWAX is
  * centre-symmetric, legacy is simple.
  */
object PfbTables {

  sealed trait MwaVersion
  case object CorrMwaxV2 extends MwaVersion
  case object CorrLegacy extends MwaVersion
  case object CorrOldLegacy extends MwaVersion

  private def load(name: String): Array[Double] = {
    val in = getClass.getResourceAsStream(s"/graft/pfb/$name")
    require(in != null, s"missing PFB gain resource $name")
    try {
      scala.io.Source.fromInputStream(in, "ASCII").getLines()
        .map(_.trim).filter(_.nonEmpty).map(_.toDouble).toArray
    } finally in.close()
  }

  /** MWAX critically-sampled PFB, 200 Hz ultrafine resolution. */
  lazy val Jake2022_200Hz: Array[Double] = load("pfb_jake_2022_200hz.txt")

  /** MWAX oversampled PFB, 200 Hz ultrafine resolution. */
  lazy val OsJake2025_200Hz: Array[Double] =
    load("ospfb_jake_2025_200hz.txt")

  /** Legacy correlator PFB, 10 kHz ultrafine resolution. */
  lazy val Cotter2014_10kHz: Array[Double] =
    load("pfb_cotter_2014_10khz.txt")

  /** `--passband-gains auto` (cli.rs:1401-1443). */
  def select(version: MwaVersion, oversampled: Boolean,
             derippleApplied: Boolean): Option[Array[Double]] =
    if (derippleApplied) None
    else Some(version match {
      case CorrMwaxV2 if !oversampled => Jake2022_200Hz
      case CorrMwaxV2 => OsJake2025_200Hz
      case CorrLegacy | CorrOldLegacy => Cotter2014_10kHz
    })

  /** `ScrunchType::from_mwa_version` (corrections.rs:534-547). */
  def centerSymmetric(version: MwaVersion): Boolean = version match {
    case CorrMwaxV2 => true
    case CorrLegacy | CorrOldLegacy => false
  }

  /** The selected table scrunched to the observation's fine-channel
    * resolution — fscrunch derivation as corrections.rs:489-502 (table
    * length must divide evenly).
    */
  def scrunched(version: MwaVersion, oversampled: Boolean = false,
                nFineChansPerCoarse: Int = Obs.FineChansPerCoarse)
      : Array[Double] = {
    val g = select(version, oversampled, derippleApplied = false).get
    require(g.length % nFineChansPerCoarse == 0,
      s"gain table length ${g.length} not a multiple of " +
        s"$nFineChansPerCoarse fine chans per coarse")
    graft.ops.PassbandGains.scrunchGains(
      g, g.length / nFineChansPerCoarse, centerSymmetric(version))
  }
}
