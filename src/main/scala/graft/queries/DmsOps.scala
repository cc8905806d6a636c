package graft.queries

object DmsOps {
  val all: Seq[Q] = Seq()
}
