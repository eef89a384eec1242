package graft.model

import org.scalatest.funsuite.AnyFunSuite

class TimeSpec extends AnyFunSuite {

  test("holoceneCalYear normalizes AD/BC/BP (F6, ref Scenarios.fs:12-19)") {
    assert(Time.holoceneCalYear("AD", 1950) == 0)
    assert(Time.holoceneCalYear("AD", 2000) == -50)
    assert(Time.holoceneCalYear("AD", 1) == 1949)
    assert(Time.holoceneCalYear("BC", 1) == 1951)
    assert(Time.holoceneCalYear("BC", 10050) == 12000)
    assert(Time.holoceneCalYear("BP", 11650) == 11650)
    assert(Time.holoceneCalYear("calYrBP", 9999.4) == 9999)
  }

  test("bounds check matches reference seed bounds (F7, ref Exposure.fs:66-70)") {
    assert(Time.inBounds(-72) && Time.inBounds(14000))
    assert(!Time.inBounds(-73) && !Time.inBounds(14001))
  }

  test("timeNodeKey routes out-of-scope years to pre-Holocene label (J8/J9)") {
    assert(Time.timeNodeKey(0) == "calyearnode_0ybp")
    assert(Time.timeNodeKey(11650) == "calyearnode_11650ybp")
    assert(Time.timeNodeKey(11651) == Time.PreHoloceneKey)
    assert(Time.timeNodeKey(14000) == Time.PreHoloceneKey)
  }
}
