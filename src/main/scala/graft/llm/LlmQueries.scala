package graft.llm

import graft.Q

object LlmQueries {
  val all: Seq[Q] = Seq.empty
}
