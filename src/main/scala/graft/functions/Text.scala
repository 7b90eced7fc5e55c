package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical tokenization / shingling used by every text operator.
  *
  * The exact same definition is mirrored in the DuckDB oracle SQL
  * (see [[graft.SparkEntry.oracleSql]]): tokens are the non-empty
  * pieces of `lower(text)` split on runs of non-alphanumerics;
  * positions are 1-based; a k-shingle is k consecutive tokens joined
  * by a single space.
  *
  * Everything here stays inside Catalyst (higher-order functions, no
  * UDFs) so whole-stage codegen applies and the expressions survive
  * column pruning / predicate pushdown at 100 TB scale.
  */
object Text {

  /** Non-empty lowercase tokens, in document order. */
  def toks(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  /** Word k-shingles ("w1 w2 w3" for k=3); empty array when the doc
    * has fewer than k tokens.
    */
  def shingles(tk: Column, k: Int = 3): Column = {
    val gram = (i: Column) =>
      concat_ws(" ", (1 to k).map(off => element_at(tk, i + off)): _*)
    when(size(tk) >= k, transform(sequence(lit(0), size(tk) - k), gram))
      .otherwise(array().cast("array<string>"))
  }

  /** Whitespace-ish token count (cheap, no explode). */
  def tokenCount(text: Column): Column = size(toks(text))
}
