package graft.queries

import graft.ext.{Dedup, Multimodal}
import graft.sources.Tables

/** Operators with no ANSI-SQL oracle (driver records a rows-only check):
  * SimHash near-dup signatures and the multimodal feature-extraction
  * plumbing (stub decoder — see [[graft.ext.Multimodal.decodeStub]]). */
object SparkOnly {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_simhash",
      None,
      (s, dir) => Dedup.simhash(Tables.load(s, dir, "documents"))),

    QueryDef(
      "q_mm_features",
      None,
      (s, dir) => Multimodal.extractFeatures(
        Multimodal.documentsAsMedia(Tables.load(s, dir, "documents"))))
  )
}
