package graft.queries
object StreamingQueries { def defs: Seq[QueryDef] = Seq() }
