package graft.queries

/** Placeholder groups — filled in by later milestones (M4 ABI decode,
  * M7 extensions). Kept separate so Catalog compiles throughout. */
object DedupQueries extends QueryGroup { val queries: Seq[Q] = Seq() }
object TextQueries extends QueryGroup { val queries: Seq[Q] = Seq() }
object SimilarityQueries extends QueryGroup { val queries: Seq[Q] = Seq() }
object MultimodalQueries extends QueryGroup { val queries: Seq[Q] = Seq() }
