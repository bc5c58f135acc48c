package graft.graph

import graft.Q

object GraphQueries {
  val all: Seq[Q] = Seq.empty
}
