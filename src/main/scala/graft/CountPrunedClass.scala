package graft

/** The registry rows whose bench-measured plan differs from full
  * materialization because the harness drives queries through `count()`
  * and Catalyst ELIMINATES provably row-preserving joins (unique-keyed
  * left joins etc.) whose outputs a bare count never reads.
  *
  * ONE source of truth, shared by the PlanAuditSpec pin (which fails
  * when a new row joins or leaves the class undocumented) and by
  * [[Bench]]'s materialized-consumer pass (which records a
  * `materialized_secs` second column for every member, so the gap
  * between the count-plan number and the full-materialization number is
  * measured in the artifact itself — no hand-audit needed when the
  * class grows; PERF.md "count() measurement semantics" carries the
  * analysis). Membership changes must update this set, the PERF note,
  * and nothing else. */
object CountPrunedClass {
  val rows: Set[String] = Set(
    "bpe_encode", "cluster_balanced_summary", "clustering_coeff",
    "contam_fraction", "contam_semantic", "decontam_verdict",
    "doc_oov_rate", "doc_repetition", "dsir_scores", "dsir_sample",
    "incr_ingest_dedup", "incr_ingest_dedup_served", "incr_ingest_semdedup",
    "incr_ingest_semdedup_ann", "incr_ingest_semdedup_ann_047",
    "incr_ingest_semdedup_banded",
    "pagerank_near_dup", "quality_learned_served", "quality_mixer",
    "source_drift",
    "source_drift_semantic", "source_mixture_summary", "substring_dedup")
}
