package graft.text

import graft.Q

object TextQueries {
  val all: Seq[Q] = Seq.empty
}
