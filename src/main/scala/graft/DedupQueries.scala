package graft

/** Placeholder — populated in a later milestone (SURVEY.md §7.2 M4). */
object DedupQueries { val all: Seq[Q] = Seq() }
