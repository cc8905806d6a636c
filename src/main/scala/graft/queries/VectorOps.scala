package graft.queries

object VectorOps {
  val all: Seq[Q] = Seq()
}
