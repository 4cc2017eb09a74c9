package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.entries.Corrections

/** The bundled real corrections dataset parses to the published shape
  * (reference src/data/corrections.json via loader corrections.ts:17-24)
  * and the loader replicates the JS filter semantics. */
class CorrectionsSpec extends AnyFunSuite {

  test("real dataset: 24 date patches, 17 alias groups, no org remaps") {
    val d = Corrections.real
    assert(d.dateCorrections.size == 24)
    assert(d.aliasGroups.size == 17)
    assert(d.orgCorrections.isEmpty)
  }

  test("spot values survive the parse") {
    val d = Corrections.real
    assert(d.dateCorrections.contains((52803L, None, Some("2025-02-24"))))
    assert(d.dateCorrections.contains((14388L, Some("2018-06-19"), Some("2018-06-26"))))
    val sos = d.aliasGroups.find(_._1 == "WV Secretary of State").get._2
    assert(sos == Seq("WVSOS", "Secretary of State", "West Virginia Secretary of State"))
  }

  test("loader filters: non-numeric ids and empty-date patches drop (JS falsy)") {
    val d = Corrections.parse(
      """{"entries": {"5": {"request_date": "2020-01-01"},
        |             "x": {"request_date": "2020-01-01"},
        |             "6": {"request_date": ""},
        |             "7": {}},
        |  "agencies": {"A": ["a1"]},
        |  "organizations": {"from": "to"}}""".stripMargin)
    assert(d.dateCorrections == Seq((5L, Some("2020-01-01"), None)))
    assert(d.aliasGroups == Seq("A" -> Seq("a1")))
    assert(d.orgCorrections == Seq("from" -> "to"))
  }

  test("alias candidates expand a real group for filtering") {
    val cands = Corrections.aliasCandidates("WVSOS").map(_.toLowerCase)
    assert(cands.contains("wv secretary of state") &&
      cands.contains("secretary of state") && cands.contains("wvsos"))
  }
}
