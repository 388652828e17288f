package graft

import java.util.Locale

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's JSON must be byte-valid regardless of the
  * box's default locale — the `f` interpolator renders comma decimals
  * on e.g. de_DE, which silently breaks the driver's json parse (a
  * real failure mode from an earlier round). These tests pin the
  * formatting helpers under a hostile default locale.
  */
class ArtifactFormatSpec extends AnyFunSuite {

  private def withLocale[A](l: Locale)(body: => A): A = {
    val saved = Locale.getDefault
    Locale.setDefault(l)
    try body finally Locale.setDefault(saved)
  }

  test("dec/num emit dot decimals even under a comma-decimal default locale") {
    withLocale(Locale.GERMANY) {
      assert(Bench.dec(4.3, 2) == "4.30")
      assert(Bench.num(4.3) == "4.3")
      assert(Bench.dec(-1.0, 2) == "-1.00") // the failed-probe sentinel
      // the f interpolator really is locale-sensitive here — the guard
      // exists because this would otherwise reach the artifact
      assert(f"${4.3}%.2f" == "4,30")
    }
  }

  test("num strips trailing zeros but never the integer part") {
    assert(Bench.num(1.50) == "1.5")
    assert(Bench.num(3.00) == "3")
    assert(Bench.num(0.07) == "0.07")
    assert(Bench.num(10.0) == "10")
  }

  test("jsonStr escapes quotes/backslashes and flattens newlines") {
    assert(Bench.jsonStr("""a"b\c""") == "\"a\\\"b\\\\c\"")
    assert(Bench.jsonStr("x\ny\rz\tw") == "\"x y z w\"")
  }
}
