package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the subword BPE loop to the textbook Sennrich et al. 2016
  * example: vocabulary {low:5, lower:2, newest:6, widest:3} must learn
  * the canonical merge sequence e+s, es+t, est+</w>, l+o, lo+w.
  */
class BpeSubwordSpec extends AnyFunSuite with SparkSpec {

  test("Sennrich fixture: merge order and final segmentations") {
    import spark.implicits._
    val words = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val (out, merges) = TextOps.bpeSubwordTrain(words, k = 5)
    // the textbook sequence (e+s, es+t, est+</w>, l+o, lo+w) in the
    // engine's '_'-joiner spelling for merged symbols
    assert(merges === Seq("e|s", "e_s|t", "e_s_t|</w>", "l|o", "l_o|w"))
    val st = out.collect().map(r => r.getString(0) -> r.getString(3)).toMap
    // after 5 merges: 'low' is one symbol + marker, 'newest' is
    // n e w est</w>, 'widest' is w i d est</w>, 'lower' is low e r </w>
    assert(st("low") === "|l_o_w|</w>|")
    assert(st("lower") === "|l_o_w|e|r|</w>|")
    assert(st("newest") === "|n|e|w|e_s_t_</w>|")
    assert(st("widest") === "|w|i|d|e_s_t_</w>|")
    val nSyms = out.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(nSyms === Map(
      "low" -> 2L, "lower" -> 4L, "newest" -> 4L, "widest" -> 4L))
  }

  test("repeated-character words: double-pass rewrite reaches the fixpoint") {
    import spark.implicits._
    // 'aaaa' with pair a|a: leftmost non-overlapping merge twice gives
    // |a_a|a_a|</w>| — the second pass catches the occurrence whose
    // leading delimiter the first pass consumed
    val words = Seq(("aaaa", 3L)).toDF("word", "freq")
    val (out, merges) = TextOps.bpeSubwordTrain(words, k = 1)
    assert(merges === Seq("a|a"))
    assert(out.collect()(0).getString(3) === "|a_a|a_a|</w>|")
  }

  test("corpus run matches the SQL-replayed oracle shape on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextOps.bpeSubwordLoop(docs, k = 6)
    val n = out.count()
    val vocab = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .distinct().count()
    assert(n === vocab) // one row per distinct word
    // every learned symbol stream still round-trips to the original word
    val bad = out.where(
      regexp_replace(regexp_replace(col("st"), "[|_]", ""), "</w>", "")
        =!= col("word")).count()
    assert(bad === 0L)
  }
}
