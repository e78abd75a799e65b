package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{count, expr, lit}

/** Shared plumbing of the persisted-index-artifact contract (IVF
  * centroids, the incremental-ingest base index, NB weight tables):
  * a common on-disk root per data directory, plus a PROVENANCE sidecar
  * so a serve-only session can detect a stale artifact.
  *
  * The staleness hole the sidecar closes: artifacts live under
  * `java.io.tmpdir` keyed by the sanitized source path (the harness
  * data dirs are read-only — in production this is a lakehouse table
  * next to the corpus), so an artifact left behind by an earlier run
  * over DIFFERENT data at the same path would otherwise be served
  * silently. Each write stamps a fingerprint of the SOURCE table the
  * artifact was derived from (row count + order-free xxhash64 fold of
  * the id column — one pushed-down single-column scan); each serve-only
  * read recomputes the source fingerprint and requires an exact match.
  * At 100 TB the same contract is a catalog version / snapshot id
  * carried in table metadata instead of a recomputed scan — the sidecar
  * is the harness stand-in with identical semantics (serve iff the
  * index was built from THIS corpus state). */
object Artifacts {

  /** Root directory for all persisted artifacts of one data dir. */
  def artifactDir(sfDir: String): String =
    sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_artifacts/" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  /** Cheap deterministic fingerprint of a source table: row count plus
    * the bit_xor fold of xxhash64 over the id column — order-free (safe
    * under any partitioning) and overflow-free, reading one column. */
  def fingerprint(src: DataFrame, idCol: String): String = {
    val r = src.agg(count(lit(1)).as("n"),
      expr(s"coalesce(bit_xor(xxhash64($idCol)), 0L)").as("h")).head()
    s"${r.getLong(0)}:${r.getLong(1)}"
  }

  private def sidecarPath(artifactPath: String): java.nio.file.Path =
    Paths.get(artifactPath.stripSuffix("/") + ".fingerprint")

  /** Stamp the artifact at `artifactPath` as derived from a source with
    * fingerprint `fp` — called by every artifact WRITE path. */
  def writeSidecar(artifactPath: String, fp: String): Unit = {
    Files.createDirectories(sidecarPath(artifactPath).getParent)
    Files.write(sidecarPath(artifactPath),
      fp.getBytes(StandardCharsets.UTF_8))
  }

  /** Serve-time freshness check: the artifact must exist AND its sidecar
    * fingerprint must match the current source table's — called by every
    * serve-only read path before trusting the read-back table. */
  def requireFresh(artifactPath: String, currentFp: String,
      what: String): Unit = {
    require(new java.io.File(artifactPath).exists(),
      s"$what artifact not found at $artifactPath — run the training/" +
        "write path (or the registered row) in a build session first")
    val sc = sidecarPath(artifactPath)
    require(Files.exists(sc),
      s"$what artifact at $artifactPath has no provenance sidecar — " +
        "rewrite it with the current write path")
    val stamped = new String(Files.readAllBytes(sc), StandardCharsets.UTF_8)
    require(stamped == currentFp,
      s"$what artifact at $artifactPath is STALE: built from a source " +
        s"with fingerprint $stamped, but the current source fingerprints " +
        s"to $currentFp — rebuild the artifact before serving")
  }
}
