package graft.queries

object EventOps {
  val all: Seq[Q] = Seq()
}
