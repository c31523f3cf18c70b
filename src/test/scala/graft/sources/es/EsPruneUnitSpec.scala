package graft.sources.es

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import java.time.{Instant, LocalDate}

/** Pure-function contract of the connector's index discovery and window
  * pruning — pattern glob, day-suffix parsing, conjunctive ts bounds, and
  * whole-day interval pruning (the O2 logic, minus HTTP). */
class EsPruneUnitSpec extends AnyFunSuite {

  private def ts(iso: String) = java.sql.Timestamp.from(Instant.parse(iso))
  private def micros(iso: String) = {
    val i = Instant.parse(iso); i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  test("indexDay parses the -yyyy.MM.dd suffix and rejects everything else") {
    assert(EsScrollSource.indexDay("events-2024.01.09") === Some(LocalDate.of(2024, 1, 9)))
    assert(EsScrollSource.indexDay("my-app-logs-2023.12.31") === Some(LocalDate.of(2023, 12, 31)))
    assert(EsScrollSource.indexDay("events") === None)
    assert(EsScrollSource.indexDay("events-nightly") === None)
  }

  test("tsBounds collects conjunctive bounds, tightening across And, ignoring Or") {
    val (lo1, hi1) = EsScrollSource.tsBounds(Array(
      IsNotNull("ts"),
      GreaterThanOrEqual("ts", ts("2024-01-09T00:00:00Z"))), "ts")
    assert(lo1 === Some(micros("2024-01-09T00:00:00Z")) && hi1.isEmpty)

    val (lo2, hi2) = EsScrollSource.tsBounds(Array(
      And(GreaterThan("ts", ts("2024-01-02T00:00:00Z")),
          LessThanOrEqual("ts", ts("2024-01-20T12:00:00Z"))),
      GreaterThanOrEqual("ts", ts("2024-01-05T00:00:00Z"))), "ts")
    assert(lo2 === Some(micros("2024-01-05T00:00:00Z")))
    assert(hi2 === Some(micros("2024-01-20T12:00:00Z")))

    // Or is not conjunctive: it must contribute nothing
    val (lo3, hi3) = EsScrollSource.tsBounds(Array(
      Or(GreaterThan("ts", ts("2024-01-09T00:00:00Z")), IsNotNull("other"))), "ts")
    assert(lo3.isEmpty && hi3.isEmpty)

    // bounds on other columns don't leak in
    val (lo4, _) = EsScrollSource.tsBounds(Array(
      GreaterThan("created", ts("2024-01-09T00:00:00Z"))), "ts")
    assert(lo4.isEmpty)
  }

  test("pruneByWindow drops exactly the day indices that provably miss the window") {
    val idx = (1 to 10).map(d => f"events-2024.01.$d%02d") :+ "events-unsuffixed"
    val kept = EsScrollSource.pruneByWindow(idx, Array(
      GreaterThanOrEqual("ts", ts("2024-01-04T06:00:00Z")),
      LessThan("ts", ts("2024-01-07T00:00:00Z"))), "ts")
    // Jan 4 overlaps the lo cut's day; Jan 7's [00:00,24:00) starts AT hi —
    // hi < start is false, so it is conservatively kept (row filter drops it)
    assert(kept === Seq("events-2024.01.04", "events-2024.01.05",
      "events-2024.01.06", "events-2024.01.07", "events-unsuffixed"))
    // no bounds → nothing pruned
    assert(EsScrollSource.pruneByWindow(idx, Array(IsNotNull("ts")), "ts") === idx)
  }
}
