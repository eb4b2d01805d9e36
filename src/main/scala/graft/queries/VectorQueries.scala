package graft.queries
object VectorQueries { def defs: Seq[QueryDef] = Seq() }
