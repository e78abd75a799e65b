package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lints the ENTIRE oracle corpus — every value in [[SparkEntry.oracleSql]].
  *
  * Motivation (round 14 postmortem): a refactor that extracted a shared SQL
  * closure dropped one `.stripMargin`, shipping two oracles whose text still
  * carried raw `|` margin characters; DuckDB died at parse
  * (`syntax error at or near "|"`) and the rows went to the driver with
  * their cross-engine verification never having run. Nothing in the suite
  * looked at the strings themselves. With ~175 margin-joined SQL literals in
  * the registry, this class of bug is one missed `.stripMargin` away at all
  * times — so the corpus is linted as data, session-free.
  */
class OracleLintSpec extends AnyFunSuite {

  private lazy val oracles: Map[String, String] = SparkEntry.oracleSql

  test("every oracle value is non-empty") {
    val empty = oracles.collect { case (k, v) if v.trim.isEmpty => k }
    assert(empty.isEmpty, s"empty oracle SQL for: ${empty.mkString(", ")}")
  }

  test("no oracle line starts with a raw stripMargin '|' character") {
    // A line of margin-joined Scala SQL that escaped `.stripMargin` starts
    // with optional whitespace then '|'. Legitimate SQL never does: '|' is
    // only valid mid-expression (||, bitwise) and our corpus never begins a
    // line with it.
    val offenders = oracles.flatMap { case (k, v) =>
      val bad = v.linesIterator.zipWithIndex.collect {
        case (line, i) if line.matches("""^\s*\|.*""") => s"line ${i + 1}: $line"
      }.toList
      if (bad.isEmpty) None
      else Some(s"$k ->\n  ${bad.take(3).mkString("\n  ")}")
    }
    assert(offenders.isEmpty,
      s"oracle SQL with unstripped margins (missing .stripMargin?):\n" +
        offenders.mkString("\n"))
  }

  test("every oracle names a known query, and vice versa for SQL-checked rows") {
    val queries = SparkEntry.queries.keySet
    val orphanOracles = oracles.keySet.diff(queries)
    assert(orphanOracles.isEmpty,
      s"oracleSql keys with no matching query: ${orphanOracles.mkString(", ")}")
  }
}
