package graft.oracle

/** Per-query DuckDB oracle SQL. Each entry is the independent SQL twin of
  * a SparkEntry query — same column names, same operand order for every
  * floating-point expression (see OracleSql parity rules).
  */
object Oracles {

  private val compList = (0 until 8).map(k => s"v$k").mkString(", ")

  val s1VisSynth: String = OracleSql.query(
    s"SELECT t, ant1, ant2, bl, cc, fc, chan, freq_hz, $compList, w FROM vis")

  val f6SetFlags: String = OracleSql.query(
    "SELECT t, bl, chan, flag FROM vis_flagged",
    OracleSql.visFlaggedCte)

  val w2Weights: String = OracleSql.queryWeighted(
    "SELECT t, bl, chan, weight FROM vis_weighted")

  val a1Avg: String = {
    val comps = (0 until 8).map { k =>
      s"  coalesce(sum(CASE WHEN NOT flag THEN weight * v$k END)" +
        s" / sum(CASE WHEN NOT flag THEN weight END), avg(v$k)) AS a$k"
    }.mkString(",\n")
    OracleSql.queryWeighted(
      s"""SELECT bl, ant1, ant2, CAST(t // 2 AS BIGINT) AS t_out,
         |       CAST(chan // 2 AS BIGINT) AS c_out,
         |$comps,
         |  bool_and(flag) AS flag_out,
         |  coalesce(sum(CASE WHEN NOT flag THEN weight END), 0.0e0)
         |    AS weight_out,
         |  count(*) AS n_samples
         |FROM vis_weighted
         |GROUP BY 1, 2, 3, 4, 5""".stripMargin)
  }

  val c1Cable: String = {
    // (re, im, ΔL-expr) per pol pair — mirrors CableCorrection.pols.
    val pols = Seq(
      (0, 1, "(lx2 - lx1)"), (2, 3, "(ly2 - lx1)"),
      (4, 5, "(lx2 - ly1)"), (6, 7, "(ly2 - ly1)"))
    val outs = pols.flatMap { case (ri, ii, dl) =>
      val th = s"-2.0e0 * pi() * $dl * freq_hz / 299792458.0e0"
      Seq(
        s"  round(CASE WHEN ant1 = ant2 THEN v$ri ELSE " +
          s"v$ri * cos($th) - v$ii * sin($th) END, 6) AS r$ri",
        s"  round(CASE WHEN ant1 = ant2 THEN v$ii ELSE " +
          s"v$ri * sin($th) + v$ii * cos($th) END, 6) AS r$ii")
    }.mkString(",\n")
    OracleSql.query(
      s"""SELECT t, bl, chan,
         |$outs
         |FROM (
         |  SELECT v.*, a1.elec_len_x_m AS lx1, a1.elec_len_y_m AS ly1,
         |         a2.elec_len_x_m AS lx2, a2.elec_len_y_m AS ly2
         |  FROM vis v JOIN antenna a1 ON v.ant1 = a1.ant
         |             JOIN antenna a2 ON v.ant2 = a2.ant)""".stripMargin)
  }
}
