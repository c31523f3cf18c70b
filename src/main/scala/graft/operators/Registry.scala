package graft.operators

import graft.SparkEntry.Q

/** Additional declared queries beyond the relational core — extension packs
  * (dedup, similarity, text, multimodal, streaming, schema/JSON parity)
  * register here as they land. */
object Registry {
  def extra: Seq[Q] = Seq.empty
}
