package graft

/** Plan-hygiene sweep over the whole driver surface: no query may
  * plan a CartesianProduct or a SortMergeJoin at the test scale —
  * every join must broadcast (or hash-aggregate after a union) and
  * every cross join must be an explicit broadcast. Keeps the scale
  * claims in SURVEY §4 honest as operators evolve.
  */
class PlanHygieneSpec extends GraftSuite {

  test("no query plans a cartesian product or sort-merge join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      Seq("CartesianProduct", "SortMergeJoin").filter(plan.contains)
        .map(op => s"$name: $op")
    }
    assert(offenders.isEmpty, s"plan hygiene violations:\n${offenders.mkString("\n")}")
  }
}
