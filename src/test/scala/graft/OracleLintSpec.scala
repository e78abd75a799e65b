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
    // the REVERSE direction — the gap this spec exists to catch: a
    // registered query that silently lost (or never gained) its oracle
    // would otherwise reach the driver with cross-engine verification
    // never having run. The only rows allowed to be SQL-free are the
    // three documented rows-only-by-design members (sketch outputs and
    // the noise-regime LSH face, each with a green exact sibling);
    // adding a fourth requires listing it HERE, with the design reason
    // in its scaladoc.
    val rowsOnlyByDesign = Set(
      "q8_approx_distinct",             // HLL sketch — no DuckDB twin
      "source_len_approx_percentiles",  // GK sketch — no DuckDB twin
      "emb_lsh_near_dup")               // noise-regime LSH; _hi is exact
    val unoracled = queries.diff(oracles.keySet ++ rowsOnlyByDesign)
    assert(unoracled.isEmpty,
      s"registered queries with no oracle and no rows-only-by-design " +
        s"listing: ${unoracled.mkString(", ")}")
    val staleAllowlist = rowsOnlyByDesign.diff(queries)
    assert(staleAllowlist.isEmpty,
      s"rows-only allowlist names unregistered queries: " +
        staleAllowlist.mkString(", "))
    val overAllowed = rowsOnlyByDesign.intersect(oracles.keySet)
    assert(overAllowed.isEmpty,
      s"allowlisted rows-only queries that DO have oracles (remove from " +
        s"the allowlist): ${overAllowed.mkString(", ")}")
  }
}
