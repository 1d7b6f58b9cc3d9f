package graft.llm

/** SQL expression fragments shared between the Spark implementation
  * (via `expr(...)`, still fully Catalyst/codegen) and the DuckDB oracle.
  *
  * Why generated text: the dedup/similarity operators hinge on hash and
  * list-fold arithmetic where both engines must evaluate the SAME integer
  * and double operations in the SAME order. Generating both dialects from
  * one builder makes that parity structural instead of hoped-for.
  *
  * Dialect notes handled here:
  *  - Spark `transform`'s lambda index is 0-based, DuckDB's is 1-based;
  *  - Spark list fold is `aggregate(l, init, f)`, DuckDB is
  *    `list_reduce(list_prepend(init, l), f)` (both left folds — verified:
  *    0.0 + x == x in IEEE so the prepended init is exact);
  *  - both share md5/substr/instr, so hex→int needs no dialect split.
  */
object TextExprs {

  sealed trait Dialect
  case object SparkD extends Dialect
  case object DuckD extends Dialect

  /** Whitespace tokenisation (single-space; both engines keep empty
    * tokens identically).
    */
  def tokens(text: String)(implicit d: Dialect): String = d match {
    case SparkD => s"split($text, ' ')"
    case DuckD  => s"string_split($text, ' ')"
  }

  def listSize(l: String)(implicit d: Dialect): String = d match {
    case SparkD => s"size($l)"
    case DuckD  => s"len($l)"
  }

  /** 1-based element access. */
  def elem(l: String, i: String)(implicit d: Dialect): String = d match {
    case SparkD => s"element_at($l, $i)"
    case DuckD  => s"$l[$i]"
  }

  /** transform with a 1-based index exposed to the body. */
  def listTransformIdx(l: String, body: (String, String) => String)
                      (implicit d: Dialect): String = d match {
    case SparkD => s"transform($l, (x, i0) -> ${body("x", "(i0 + 1)")})"
    case DuckD  => s"list_transform($l, (x, i) -> ${body("x", "i")})"
  }

  def listTransform(l: String, body: String => String)
                   (implicit d: Dialect): String = d match {
    case SparkD => s"transform($l, x -> ${body("x")})"
    case DuckD  => s"list_transform($l, x -> ${body("x")})"
  }

  /** [[listTransform]] with a caller-chosen lambda variable name — for
    * bodies that THEMSELVES contain lambdas using the default `x`
    * (e.g. the BPE merge fold): an inner lambda's `x` shadows the
    * outer one, silently rebinding the body's element references, so
    * nesting callers must pick a name no inner lambda uses.
    */
  def listTransformNamed(l: String, v: String, body: String => String)
                        (implicit d: Dialect): String = d match {
    case SparkD => s"transform($l, $v -> ${body(v)})"
    case DuckD  => s"list_transform($l, $v -> ${body(v)})"
  }

  def listMin(l: String)(implicit d: Dialect): String = d match {
    case SparkD => s"array_min($l)"
    case DuckD  => s"list_min($l)"
  }

  def listDistinctSize(l: String)(implicit d: Dialect): String = d match {
    case SparkD => s"size(array_distinct($l))"
    case DuckD  => s"len(list_distinct($l))"
  }

  /** Left-fold sum of a DOUBLE list — sequential, so bit-identical across
    * engines for identical element order.
    */
  def listFoldSumDouble(l: String)(implicit d: Dialect): String = d match {
    case SparkD =>
      s"aggregate($l, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    case DuckD =>
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $l)," +
        " (acc, x) -> acc + x)"
  }

  /** Left-fold sum of a BIGINT list. */
  def listFoldSumLong(l: String)(implicit d: Dialect): String = d match {
    case SparkD =>
      s"aggregate($l, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    case DuckD =>
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $l)," +
        " (acc, x) -> acc + x)"
  }

  /** First 8 hex digits of md5 as a BIGINT in [0, 2^32). */
  def hex8ToLong(e: String)(implicit d: Dialect): String =
    hex8FromMd5(s"md5($e)")

  /** Same conversion given an ALREADY-COMPUTED md5 hex string
    * expression — use via a two-stage transform so md5 runs once per
    * element, not once per extracted hex digit. VALUE-identical in
    * both dialects, but the rendering differs: Spark has `conv`
    * (one hex-string parse — measurably cheaper than eight
    * instr/substr digit extractions in the hash-heavy dedup
    * operators), DuckDB does not, so the oracle keeps the positional
    * digit sum.
    */
  def hex8FromMd5(m: String)(implicit d: Dialect): String = d match {
    case SparkD =>
      s"CAST(conv(substr($m, 1, 8), 16, 10) AS BIGINT)"
    case DuckD =>
      (0 until 8).map { i =>
        s"(CAST(instr('0123456789abcdef', substr($m, ${i + 1}, 1)) - 1" +
          s" AS BIGINT) * ${1L << (4 * (7 - i))})"
      }.mkString("(", " + ", ")")
  }

  /** Hash every element of a string list: md5 once per element, then the
    * hex8 extraction.
    */
  def hashList(l: String)(implicit d: Dialect): String =
    listTransform(listTransform(l, s => s"md5($s)"),
      m => hex8FromMd5(m))

  /** Universal-hash family applied to an already-hashed BIGINT:
    * perm_j(h) = (a_j * h + b_j) mod 2147483647 — the ONE definition of
    * the permutation constants; MinHash signatures and their oracle twin
    * both render through here.
    */
  def permute(h: String, j: Int): String = {
    val a = 2 * j + 3
    val b = 12345L * j + 7
    s"(($h * $a + $b) % 2147483647)"
  }

  /** Universal-hash family over the md5-derived integer:
    * h_j(s) = (a_j * H(s) + b_j) mod 2147483647.
    */
  def tokenHash(e: String, j: Int)(implicit d: Dialect): String =
    permute(hex8ToLong(e), j)

  /** Adjacent word 2-grams joined by a space; documents with fewer than
    * 2 tokens contribute an empty list (the empty case is spelled as a
    * zero-length slice of the token list so both engines agree on the
    * element type).
    */
  def grams2(toksExpr: String)(implicit d: Dialect): String = {
    val n = listSize(toksExpr)
    val body = listTransformIdx(
      d match {
        case SparkD => s"sequence(1, $n - 1)"
        case DuckD  => s"range(1, $n)"
      },
      (x, _) => s"concat(${elem(toksExpr, x)}, ' '," +
        s" ${elem(toksExpr, s"$x + 1")})")
    d match {
      case SparkD =>
        s"CASE WHEN $n < 2 THEN slice($toksExpr, 1, 0) ELSE $body END"
      case DuckD =>
        s"CASE WHEN $n < 2 THEN $toksExpr[1:0] ELSE $body END"
    }
  }

  /** 1..to inclusive integer sequence (Spark's `sequence` is
    * stop-inclusive, DuckDB's `range` stop-exclusive).
    */
  def idxSeq1(to: String)(implicit d: Dialect): String = d match {
    case SparkD => s"sequence(1, $to)"
    case DuckD  => s"range(1, ($to) + 1)"
  }

  /** 1-based, length-bounded list slice (Spark's slice takes INT
    * positions; DuckDB slices are stop-inclusive).
    */
  def listSlice(l: String, start1: String, len: String)
               (implicit d: Dialect): String = d match {
    case SparkD =>
      s"slice($l, CAST($start1 AS INT), CAST($len AS INT))"
    case DuckD  => s"$l[($start1):(($start1) + ($len) - 1)]"
  }

  /** Integer → string, spelled per dialect (same digits both sides). */
  def toStr(e: String)(implicit d: Dialect): String = d match {
    case SparkD => s"CAST($e AS STRING)"
    case DuckD  => s"CAST($e AS VARCHAR)"
  }

  /** Join a string list with single spaces. */
  def joinList(l: String)(implicit d: Dialect): String = d match {
    case SparkD => s"array_join($l, ' ')"
    case DuckD  => s"array_to_string($l, ' ')"
  }

  /** Count of regexp matches as BIGINT (Java regex vs RE2 — callers must
    * use patterns with identical semantics in both).
    */
  def regexpCount(e: String, pattern: String)
                 (implicit d: Dialect): String = d match {
    case SparkD => s"regexp_count($e, '$pattern')"
    case DuckD  => s"CAST(len(regexp_extract_all($e, '$pattern')) AS BIGINT)"
  }

  /** Word k-shingles (k=3) joined by spaces; documents shorter than k
    * tokens contribute the whole text as their single shingle.
    */
  def shingles(text: String, toksExpr: String)
              (implicit d: Dialect): String = {
    val n = listSize(toksExpr)
    val idxBody = listTransformIdx(
      d match {
        case SparkD => s"sequence(1, $n - 2)"
        case DuckD  => s"range(1, $n - 1)"
      },
      (x, _) => s"concat(${elem(toksExpr, x)}, ' '," +
        s" ${elem(toksExpr, s"$x + 1")}, ' ', ${elem(toksExpr, s"$x + 2")})")
    d match {
      case SparkD => s"CASE WHEN $n < 3 THEN array($text) ELSE $idxBody END"
      case DuckD  => s"CASE WHEN $n < 3 THEN [$text] ELSE $idxBody END"
    }
  }
}
