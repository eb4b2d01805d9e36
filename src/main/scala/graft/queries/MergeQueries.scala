package graft.queries
object MergeQueries { def defs: Seq[QueryDef] = Seq() }
