package graft.queries

object TextOps {
  val all: Seq[Q] = Seq()
}
