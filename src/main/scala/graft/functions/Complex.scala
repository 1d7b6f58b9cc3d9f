package graft.functions

import org.apache.spark.sql.Column

/** Complex and 2x2-complex-matrix (Jones) algebra, generic over the
  * expression representation.
  *
  * The same structural code renders to BOTH a Spark `Column` tree and the
  * DuckDB oracle's SQL text — so the f64 operand order of every
  * multiply/add is identical by construction on both sides, which (with
  * dyadic-rational inputs) makes results bit-identical across engines.
  * This is how the DI-calibration Jones sandwich J1 · V · J2^H
  * (/root/reference/src/calibration.rs:111-115) stays oracle-exact with
  * zero rounding tolerance.
  */
trait Num[T] {
  def add(a: T, b: T): T
  def sub(a: T, b: T): T
  def mul(a: T, b: T): T
  def neg(a: T): T
}

object Num {
  implicit val colNum: Num[Column] = new Num[Column] {
    def add(a: Column, b: Column): Column = a + b
    def sub(a: Column, b: Column): Column = a - b
    def mul(a: Column, b: Column): Column = a * b
    def neg(a: Column): Column = -a
  }
  /** SQL-text rendering; parenthesise everything so precedence is moot. */
  implicit val sqlNum: Num[String] = new Num[String] {
    def add(a: String, b: String): String = s"($a + $b)"
    def sub(a: String, b: String): String = s"($a - $b)"
    def mul(a: String, b: String): String = s"($a * $b)"
    def neg(a: String): String = s"(- $a)"
  }
}

case class Complex[T](re: T, im: T)(implicit n: Num[T]) {
  def +(o: Complex[T]): Complex[T] =
    Complex(n.add(re, o.re), n.add(im, o.im))
  def -(o: Complex[T]): Complex[T] =
    Complex(n.sub(re, o.re), n.sub(im, o.im))
  def *(o: Complex[T]): Complex[T] =
    Complex(
      n.sub(n.mul(re, o.re), n.mul(im, o.im)),
      n.add(n.mul(re, o.im), n.mul(im, o.re)))
  def conj: Complex[T] = Complex(re, n.neg(im))
}

/** 2x2 complex Jones matrix, component order XX, XY, YX, YY
  * (/root/reference/src/van_vleck.rs:237-258).
  */
case class JonesM[T](xx: Complex[T], xy: Complex[T],
                     yx: Complex[T], yy: Complex[T])(implicit n: Num[T]) {
  def *(o: JonesM[T]): JonesM[T] = JonesM(
    (xx * o.xx) + (xy * o.yx), (xx * o.xy) + (xy * o.yy),
    (yx * o.xx) + (yy * o.yx), (yx * o.xy) + (yy * o.yy))
  /** Hermitian (conjugate) transpose. */
  def hermitian: JonesM[T] = JonesM(xx.conj, yx.conj, xy.conj, yy.conj)
  def components: Seq[T] =
    Seq(xx.re, xx.im, xy.re, xy.im, yx.re, yx.im, yy.re, yy.im)
}

object JonesM {
  /** Build from 8 expressions in component order. */
  def fromComponents[T: Num](c: Seq[T]): JonesM[T] = JonesM(
    Complex(c(0), c(1)), Complex(c(2), c(3)),
    Complex(c(4), c(5)), Complex(c(6), c(7)))
}
