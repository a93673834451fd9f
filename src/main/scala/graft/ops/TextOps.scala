package graft.ops
import graft.Q
object TextOps { val specs: Seq[Q] = Seq() }
