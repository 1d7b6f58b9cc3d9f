package graft

import graft.functions.VanVleckKernel._
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-exact numerics against the reference's public test vectors
  * (σ̂/σ/σ̂' tables at /root/reference/src/van_vleck.rs:400-465, generated
  * from pyuvdata — public BSD test data).
  */
class VanVleckKernelSpec extends AnyFunSuite {

  val sighats = Array(
    1.3732557118031588, 1.4567407971221236, 1.58477324876463,
    1.7205649508228396, 1.826940748902383, 1.8929606440705524,
    1.925808271869243, 1.932247719626032, 1.94109505176846,
    1.9421363881046048, 1.9405717585289137, 1.945186366392691,
    1.9506393182749087, 1.9506457264198438, 1.945944500750214,
    1.9444102576359754, 1.9511054558890455, 1.9488121382011145,
    1.939882406229821, 1.9340307650086646)

  val sigmas = Array(
    1.3425715134733938, 1.427852482209185, 1.5582670082555274,
    1.6962213882104307, 1.80413614011039, 1.87109216839722,
    1.9044119839802796, 1.9109450441433622, 1.9199216944258406,
    1.9209783088033163, 1.9193907283568603, 1.9240731081035445,
    1.9296064755666014, 1.9296129784329366, 1.9248424008595775,
    1.9232855835622369, 1.930079504724327, 1.927752308498216,
    1.9186912731345944, 1.9127540839654953)

  val sighatsPrime = Array(
    0.9776527939739493, 0.9801533937619006, 0.9831603111567421,
    0.9852926971585774, 0.9860246973943583, 0.9859337319315375,
    0.9857012789829934, 0.9856397675064799, 0.9855463948958575,
    0.9855347215188939, 0.985552206321147, 0.9854996947568739,
    0.9854339402996796, 0.9854338606488524, 0.9854907938706629,
    0.9855087264060677, 0.9854281317512257, 0.9854564230798217,
    0.9855598061732679, 0.9856217802550746)

  test("sighat matches reference vectors") {
    sigmas.zip(sighats).foreach { case (s, expect) =>
      assert(math.abs(sighat(s) - expect) < 1e-10,
        s"sighat($s) = ${sighat(s)} != $expect")
    }
  }

  test("sighat_prime matches reference vectors") {
    sigmas.zip(sighatsPrime).foreach { case (s, expect) =>
      assert(math.abs(sighatPrime(s) - expect) < 1e-10)
    }
  }

  test("vanVleckAuto inverts sighat to reference sigmas") {
    sighats.zip(sigmas).foreach { case (h, expect) =>
      assert(math.abs(vanVleckAuto(h) - expect) < 1e-8,
        s"auto($h) = ${vanVleckAuto(h)} != $expect")
    }
  }

  test("vanVleckAuto below divergence guard returns input") {
    assert(vanVleckAuto(0.3) == 0.3)
  }

  test("cross kernel: kappa roundtrip") {
    // forward: khat = corrcorrectSimp(rho); inverse must recover
    // rho*sx*sy within tolerance
    val (sx, sy) = (1.8, 1.6)
    val x = Array.tabulate(7)(i => (i + 0.5) / sx)
    val y = Array.tabulate(7)(i => (i + 0.5) / sy)
    for (rho <- Seq(0.05, 0.2, 0.5)) {
      val khat = corrcorrectSimp(rho, x, y)
      val kappa = vanVleckCrossInt(khat, sx, sy)
      assert(math.abs(kappa - rho * sx * sy) < 1e-6,
        s"rho=$rho kappa=$kappa expect=${rho * sx * sy}")
    }
  }

  test("cross kernel: |rho| >= 1 guard returns khat") {
    assert(vanVleckCrossInt(5.0, 1.0, 1.0) == 5.0)
  }
}
