package graft

import graft.functions.VanVleckKernel._
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-exact numerics against the reference's public test vectors
  * (σ̂/σ/σ̂' tables at /root/reference/src/van_vleck.rs:400-465, generated
  * from pyuvdata — public BSD test data).
  */
class VanVleckKernelSpec extends AnyFunSuite {

  import graft.functions.VanVleckVectors.{sighats, sigmas, sighatsPrime}

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
