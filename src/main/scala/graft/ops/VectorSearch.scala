package graft.ops
import graft.Q
object VectorSearch { val specs: Seq[Q] = Seq() }
