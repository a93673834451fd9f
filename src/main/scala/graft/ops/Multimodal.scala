package graft.ops
import graft.Q
object Multimodal { val specs: Seq[Q] = Seq() }
