package graft.queries

import graft.Q

// Filled in incrementally; each module gains real queries as its
// operator family lands (SURVEY.md §2 checklist).
object MultimodalOps { def all: Seq[Q] = Seq() }
object StreamingOps { def all: Seq[Q] = Seq() }
