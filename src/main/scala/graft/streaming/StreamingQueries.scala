package graft.streaming

import graft.Q

object StreamingQueries {
  val all: Seq[Q] = Seq.empty
}
